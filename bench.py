"""
Benchmark: batched IR analysis throughput (STFT + EDC + decay fits) on the
accelerator vs the float64 NumPy CPU reference implementation.

Workload: 64 stereo taps of 2^20 samples (~21.8 s @ 48 kHz) — the BASELINE
64-tap bundle shape. The device path is the fused engine
(one compiled program per tap chunk); the CPU baseline is the oracle
re-implementation of the reference algorithm (frame-loop STFT +
slice-based EDC/fits), measured on one tap and scaled (it is deterministic
per tap).

The workload is generated on-device (jax.random) so the measurement is the
analysis compute + the single packed metric fetch per chunk — matching the
deployment model where tap audio is already resident in HBM. (The dev
environment reaches its TPU through a high-latency relay, so host<->device
transfer timings here are not representative of production PCIe/DMA; the
upload-inclusive number is reported as an extra field.)

Prints ONE JSON line:
  {"metric": "irs_per_sec_stft_edc", "value": ..., "unit": "IR/s",
   "vs_baseline": <device_irs_per_sec / cpu_irs_per_sec>, ...extras}
"""

from __future__ import annotations

import json
import time

import numpy as np

SR = 48_000
BATCH = 64
NUM_SAMPLES = 1 << 20
CHUNK = 16


def _bench_config():
    from audio_analysis_tpu.engine import EngineConfig

    return EngineConfig(
        run_bands=False,
        run_fr=False,
        run_group_delay=False,
        run_modal=False,
        run_diffusion=False,
        run_stft=True,
    )


def bench_full_engine(chunks, lengths) -> float:
    """Wall-clock for the FULL engine (every report metric) over the bundle.

    Runs at half-chunks: the full config's modal 8192-FFT intermediates are
    the HBM high-water mark.
    """
    import jax.numpy as jnp
    import numpy as np

    from audio_analysis_tpu.engine import EngineConfig
    from audio_analysis_tpu.engine.batch import analyze_batch_flat, _flat_spec, unpack_flat

    config = EngineConfig()
    half = CHUNK // 2
    halves = []
    for ch in chunks:
        halves.append(ch[:half])
        halves.append(ch[half:])
    lengths_half = lengths[:half]
    spec = _flat_spec((half, 2, NUM_SAMPLES), (half,), config)
    _ = np.asarray(analyze_batch_flat(halves[0], lengths_half, config))  # compile

    start = time.perf_counter()
    flats = [analyze_batch_flat(h, lengths_half, config) for h in halves]
    results = [unpack_flat(np.asarray(f), spec) for f in flats]
    elapsed = time.perf_counter() - start
    assert all(np.all(r["t30_ok"]) for r in results)
    return elapsed


def bench_device() -> dict:
    import jax
    import jax.numpy as jnp

    from audio_analysis_tpu.engine import enable_persistent_compilation_cache
    from audio_analysis_tpu.engine.batch import analyze_batch_flat, _flat_spec, unpack_flat
    from audio_analysis_tpu.signals.jaxgen import synthetic_reverb_ir_batch

    enable_persistent_compilation_cache()
    config = _bench_config()

    # Pre-generate every chunk on device (deterministic keys).
    lengths = jnp.full((CHUNK,), NUM_SAMPLES, jnp.int32)
    chunks = []
    for i in range(BATCH // CHUNK):
        key = jax.random.PRNGKey(i)
        ir = synthetic_reverb_ir_batch(
            key, CHUNK, NUM_SAMPLES, SR,
            rt60_low_s=jnp.float32(1.6), rt60_high_s=jnp.float32(0.9),
        )
        chunks.append(ir)
    # force materialisation of the generated data before timing
    for ch in chunks:
        _ = float(ch[0, 0, 300])

    spec = _flat_spec((CHUNK, 2, NUM_SAMPLES), (CHUNK,), config)

    # warmup / compile
    _ = np.asarray(analyze_batch_flat(chunks[0], lengths, config))

    start = time.perf_counter()
    flats = [analyze_batch_flat(ch, lengths, config) for ch in chunks]
    results = [unpack_flat(np.asarray(f), spec) for f in flats]
    elapsed = time.perf_counter() - start

    ok = np.concatenate([r["t30_ok"] for r in results], axis=0)
    assert ok.shape[0] == BATCH
    assert np.all(ok), "bench workload must produce valid T30 fits"

    # upload-inclusive variant (one chunk, scaled) for reference
    host_chunk = np.asarray(chunks[0])
    start = time.perf_counter()
    _ = np.asarray(analyze_batch_flat(jnp.asarray(host_chunk), lengths, config))
    upload_elapsed = time.perf_counter() - start

    full_engine_seconds = bench_full_engine(chunks, lengths)

    return {
        "device_seconds": elapsed,
        "upload_inclusive_seconds_per_chunk": upload_elapsed,
        "full_engine_seconds": full_engine_seconds,
    }


def bench_cpu_reference(taps: int = 1) -> float:
    """Per-tap seconds for the reference algorithm (oracle, float64 CPU)."""
    from audio_analysis_tpu import oracle

    rng = np.random.default_rng(42)
    t = np.arange(NUM_SAMPLES) / SR
    env = (10.0 ** (-3.0 * t / 1.2)).astype(np.float32)

    start = time.perf_counter()
    for _ in range(taps):
        for _ch in range(2):
            x = (0.05 * rng.standard_normal(NUM_SAMPLES) * env).astype(np.float32)
            x[256] = 0.9
            xf = x.astype(np.float64)
            tt, edc_db, _ = oracle.schroeder_edc_db(xf, SR)
            for rng_db in ((-5.0, -25.0), (-5.0, -35.0), (0.0, -10.0)):
                oracle.fit_decay_slope(tt, edc_db, rng_db)
            seg = xf[int(np.argmax(np.abs(xf))):]
            oracle.stft_magnitude_db(seg, SR, 4096, 512)
    return (time.perf_counter() - start) / taps


def main() -> None:
    device = bench_device()
    device_irs_per_sec = BATCH / device["device_seconds"]

    cpu_seconds_per_ir = bench_cpu_reference(taps=1)
    cpu_irs_per_sec = 1.0 / cpu_seconds_per_ir

    import jax

    print(
        json.dumps(
            {
                "metric": "irs_per_sec_stft_edc",
                "value": round(device_irs_per_sec, 3),
                "unit": "IR/s",
                "vs_baseline": round(device_irs_per_sec / cpu_irs_per_sec, 2),
                "device_seconds_64taps": round(device["device_seconds"], 4),
                "full_report_metrics_seconds_64taps": round(device["full_engine_seconds"], 4),
                "upload_inclusive_seconds_per_chunk": round(
                    device["upload_inclusive_seconds_per_chunk"], 4
                ),
                "cpu_seconds_per_ir": round(cpu_seconds_per_ir, 3),
                "backend": jax.default_backend(),
                "batch": BATCH,
                "samples_per_tap": NUM_SAMPLES,
            }
        )
    )


if __name__ == "__main__":
    main()
