"""
Test configuration.

Where tests actually run: in this container the axon TPU plugin is
registered by sitecustomize and JAX_PLATFORMS=axon is preset, so the
DEFAULT backend for single-device tests is the real TPU (through the
tunnel). The XLA flag below additionally exposes 8 virtual CPU devices so
mesh/sharding tests can build fake-multichip meshes — those tests pass
platform="cpu" explicitly (engine.mesh.make_mesh). The 2-process
multi-host test spawns CPU-only subprocesses with the plugin disabled
(see test_distributed_multihost.py). Must be set before jax is imported.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# `AA_PLATFORM=cpu python -m pytest tests/` pins the whole suite to the
# named backend, exactly like the CLIs (utils/platform.py). Without this
# the suite always initialises the accelerator plugin's default backend,
# which hangs for the whole run when the dev relay is down — the only
# alternative recipe (`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`)
# has to be rediscovered every outage.
if os.environ.get("AA_PLATFORM", "").strip():
    from audio_analysis_tpu.utils.platform import apply_platform_override

    apply_platform_override()

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
