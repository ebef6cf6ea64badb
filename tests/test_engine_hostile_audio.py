"""Pathological tap audio must degrade to ok=False metrics, never crash.

Production capture bundles contain whatever the recorder was fed: silent
channels, DC offsets, clipped square waves, NaN/Inf from upstream DSP
bugs, denormals. The fused engine analyses a whole batch in one program,
so a single hostile tap must not poison the batch (its own ok flags go
False; other taps are unaffected).
"""

import numpy as np
import jax.numpy as jnp

from audio_analysis_tpu.engine import EngineConfig, analyze_batch

SR = 48_000
N = 1 << 15


def _hostile_batch():
    taps = {
        "silence": np.zeros((2, N), np.float32),
        "dc": np.full((2, N), 0.25, np.float32),
        "impulse_only": np.zeros((2, N), np.float32),
        "square_fs": np.sign(np.sin(2 * np.pi * 100 * np.arange(N) / SR))[None, :]
        .repeat(2, 0)
        .astype(np.float32),
        "nan_tail": np.ones((2, N), np.float32),
        "inf_spike": np.full((2, N), 0.01, np.float32),
        "denormal": np.full((2, N), 1e-40, np.float32),
        # one GOOD decaying tap, to prove hostile neighbours don't poison it
        "good": np.zeros((2, N), np.float32),
    }
    taps["impulse_only"][:, 5] = 1.0
    taps["nan_tail"][:, N // 2 :] = np.nan
    taps["inf_spike"][:, 100] = np.inf
    t = np.arange(N - 64) / SR
    env = 10.0 ** (-3.0 * t / 0.4)
    taps["good"][:, 64:] = (
        0.05 * np.random.default_rng(3).standard_normal((2, N - 64)) * env
    ).astype(np.float32)
    taps["good"][:, 64] = 0.9
    return taps


def test_engine_survives_hostile_taps():
    taps = _hostile_batch()
    names = list(taps)
    batch = np.stack(list(taps.values()))
    lengths = np.full(batch.shape[0], N, np.int32)

    out = analyze_batch(jnp.asarray(batch), jnp.asarray(lengths), EngineConfig())
    out = {k: np.asarray(v) for k, v in out.items()}

    # every fit the engine marks ok must be finite
    for key in ("t30_rt60", "t20_rt60", "edt_rt60"):
        ok = out[key.replace("_rt60", "_ok")]
        vals = out[key]
        assert np.isfinite(vals[ok]).all(), key

    # non-decaying / non-finite taps must not claim a T30
    for bad in ("silence", "impulse_only", "nan_tail", "inf_spike", "denormal"):
        assert not out["t30_ok"][names.index(bad)].any(), bad

    # the good tap still fits correctly next to the hostile ones
    gi = names.index("good")
    assert out["t30_ok"][gi].all()
    np.testing.assert_allclose(out["t30_rt60"][gi], 0.4, rtol=0.05)


def test_engine_survives_zero_and_one_sample_lengths():
    """lengths of 0 and 1 (empty/degenerate taps in a padded batch) must
    produce ok=False metrics, not crashes or claimed fits."""
    n = 1 << 14
    batch = np.zeros((3, 2, n), np.float32)
    batch[2, :, 64] = 0.9
    lengths = np.array([0, 1, n], np.int32)

    out = analyze_batch(jnp.asarray(batch), jnp.asarray(lengths), EngineConfig())
    out = {k: np.asarray(v) for k, v in out.items()}

    for key in ("t30_ok", "t20_ok", "edt_ok"):
        assert not out[key][:2].any(), key
