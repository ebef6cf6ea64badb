"""
Test configuration.

Tests run on CPU with a virtual 8-device mesh (the standard JAX
fake-multichip trick) so the sharded bundle path is exercised without TPU
hardware. Must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def synthetic_ir():
    """A ~1.5 s stereo synthetic reverb IR with known RT60 (host-generated)."""
    sr = 48_000
    n = 1 << 16  # 65536 samples = 1.365 s (pow2: no padding in kernels)
    rt60 = 0.8
    rng_local = np.random.default_rng(7)
    t = np.arange(n) / sr
    envelope = 10.0 ** (-3.0 * t / rt60)
    tail = 0.05 * rng_local.standard_normal((2, n)) * envelope
    onset = 480  # 10 ms
    ir = np.zeros((2, n), dtype=np.float64)
    ir[:, onset:] = tail[:, : n - onset]
    ir[:, onset] = 1.0
    return ir.astype(np.float32), sr, rt60, onset
