"""MXU-factored FFT (ops/mxfft.py) numerics vs numpy's float64 FFT.

Pinned to the CPU backend: these are pure-numerics checks (the TPU win is
benchmarked, not unit-tested) and CPU keeps them off the tunnel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_analysis_tpu.ops.mxfft import irfft_mx, rfft_mx

pytestmark = pytest.mark.parametrize("n", [64, 4096, 8192, 1 << 16])


def _cpu():
    return jax.default_device(jax.devices("cpu")[0])


def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n)).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    with _cpu():
        got = np.asarray(rfft_mx(jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, err


def test_irfft_roundtrip(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    with _cpu():
        back = np.asarray(irfft_mx(rfft_mx(jnp.asarray(x)), n))
    assert back.shape == x.shape
    assert np.max(np.abs(back - x)) < 1e-4
