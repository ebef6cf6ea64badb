"""
Real 2-process multi-host test for engine.distributed (CPU, local coordinator).

Spawns two CPU-only JAX processes (axon TPU plugin disabled via env, two
virtual CPU devices each), runs `analyze_bundle_multi_host` on a shared
6-tap bundle, and asserts:
  - the tap shards partition the bundle (each tap analysed exactly once,
    contiguous blocks in device order),
  - per-tap T30s recover the synthetic RT60s,
  - the bundle aggregates are identical on both processes (all-reduced).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
WORKER = REPO_ROOT / "tests" / "_mh_worker.py"

TAP_RT60S = [0.15, 0.18, 0.21, 0.24, 0.27, 0.30]


def _make_bundle(root: Path) -> None:
    from audio_analysis_tpu.io.bundle import write_bundle

    sr = 48_000
    n = 16_384
    t = np.arange(n) / sr
    rng = np.random.default_rng(42)
    taps = {}
    for i, rt60 in enumerate(TAP_RT60S):
        env = 10.0 ** (-3.0 * t / rt60)
        x = np.zeros((n, 2), np.float32)
        x[64:, :] = (0.05 * rng.standard_normal((n - 64, 2)) * env[: n - 64, None]).astype(
            np.float32
        )
        x[64, :] = 0.9
        taps[f"tap{i:02d}"] = x
    write_bundle(root, taps, sr)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_bundle_analysis(tmp_path):
    bundle = tmp_path / "bundle"
    _make_bundle(bundle)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH", ""), str(REPO_ROOT)])
    )

    coordinator = f"127.0.0.1:{_free_port()}"
    out_files = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, "2", str(i), str(bundle), str(out_files[i])],
            env=env,
            cwd=REPO_ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    # drain both pipes CONCURRENTLY: a sequential communicate() can
    # deadlock if the other worker fills its 64 KiB stdout pipe before the
    # collective barrier (verbose jax logs) while this one waits in it
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        logs = [
            f.result()[0].decode()
            for f in [pool.submit(p.communicate, timeout=600) for p in procs]
        ]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(f.read_text()) for f in out_files]

    # 4 global devices, 6 taps -> padded to 8, 2 per device; process 0
    # (devices 0,1) owns taps 0-3, process 1 owns taps 4-5 (pads dropped).
    assert results[0]["num_devices"] == 4 and results[1]["num_devices"] == 4
    all_names = [f"tap{i:02d}" for i in range(len(TAP_RT60S))]
    assert results[0]["local_tap_names"] == all_names[:4]
    assert results[1]["local_tap_names"] == all_names[4:]

    # Per-tap T30 recovers the synthetic RT60s on the owning process.
    t30_by_name = {}
    t30_all_channels = []
    for r in results:
        for name, row, okrow in zip(r["local_tap_names"], r["t30_rt60"], r["t30_ok"]):
            assert all(okrow), f"{name}: t30 fit not ok"
            t30_by_name[name] = float(np.mean(row))
            t30_all_channels.extend(float(x) for x in row)
    for name, rt60 in zip(all_names, TAP_RT60S):
        assert abs(t30_by_name[name] - rt60) < 0.15 * rt60, (name, t30_by_name[name], rt60)

    # Aggregates are all-reduced: identical on both processes, and match
    # the median over the per-tap values the processes computed.
    for key in ("bundle_median_t30", "bundle_mean_early10"):
        assert results[0][key] == pytest.approx(results[1][key], rel=1e-6), key
    assert results[0]["bundle_valid_taps"] == results[1]["bundle_valid_taps"] == len(TAP_RT60S)
    expected_median = float(np.median(t30_all_channels))
    assert results[0]["bundle_median_t30"] == pytest.approx(expected_median, rel=1e-3)

    # the multi-host report writer ran inside the workers: every tap has a
    # per-tap report (written by the owning host) and process 0 wrote the
    # index with the all-reduced aggregates
    index_md = (bundle / "reports" / "bundle_report.md").read_text()
    assert "multi-host" in index_md
    assert f"bundle_median_t30:** {expected_median:.4f}" in index_md
    for name in all_names:
        tap_md = (bundle / "reports" / name / f"{name}_report.md").read_text()
        assert "## Decay / EDC" in tap_md and "## Impulse response" in tap_md


def test_two_process_bundle_cli(tmp_path):
    """`analyse.cli bundle --multi-host` reaches run_bundle_report_multi_host:
    two CPU processes, per-tap reports written by the owning host, index by
    process 0 only."""
    bundle = tmp_path / "bundle"
    _make_bundle(bundle)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH", ""), str(REPO_ROOT)])
    )

    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "analyse.cli", "bundle",
                "--input", str(bundle),
                "--multi-host",
                "--coordinator", coordinator,
                "--num-processes", "2",
                "--process-id", str(i),
            ],
            env=env,
            cwd=REPO_ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    # drain both pipes CONCURRENTLY: a sequential communicate() can
    # deadlock if the other worker fills its 64 KiB stdout pipe before the
    # collective barrier (verbose jax logs) while this one waits in it
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        logs = [
            f.result()[0].decode()
            for f in [pool.submit(p.communicate, timeout=600) for p in procs]
        ]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"CLI worker failed:\n{log[-4000:]}"

    # only process 0 printed the index line
    wrote = [log for log in logs if "Wrote bundle report index:" in log]
    assert len(wrote) == 1, logs

    index_md = (bundle / "reports" / "bundle_report.md").read_text()
    assert "multi-host" in index_md
    all_names = [f"tap{i:02d}" for i in range(len(TAP_RT60S))]
    for name in all_names:
        tap_md = (bundle / "reports" / name / f"{name}_report.md").read_text()
        assert "## Decay / EDC" in tap_md
