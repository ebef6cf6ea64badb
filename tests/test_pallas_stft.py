"""Fused Pallas STFT kernel (ops/pallas_stft.py) numerics.

Interpret-mode on CPU (the TPU lowering + timing is characterised in
docs/PERFORMANCE.md; on-chip accuracy measured 2e-7 relative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_analysis_tpu.ops import stft as stft_ops
from audio_analysis_tpu.ops.pallas_stft import stft_magnitude_pallas, supports


def _cpu():
    return jax.default_device(jax.devices("cpu")[0])


@pytest.mark.parametrize("n_fft,hop", [(4096, 512), (8192, 512), (4096, 1024)])
def test_matches_windowed_rfft(n_fft, hop):
    rng = np.random.default_rng(0)
    n = 1 << 15
    x = rng.standard_normal((2, n)).astype(np.float32)
    t = 1 + (n - n_fft) // hop
    w = np.hanning(n_fft)
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    ref = np.abs(np.fft.rfft(x[:, idx] * w, axis=-1))
    with _cpu():
        got = np.asarray(
            stft_magnitude_pallas(jnp.asarray(x), n_fft, hop, True, interpret=True)
        )
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(ref)
    assert err < 1e-5, err


def test_supports_contract():
    assert supports(4096, 512) and supports(8192, 512)
    assert not supports(4096, 500)  # hop not a multiple of 64
    assert not supports(3000, 512)  # not a power of two
    assert not supports(2048, 512)  # below the supported size


def test_stft_magnitude_pallas_impl_falls_back_off_tpu(tmp_path):
    """fft_impl="pallas" must produce mx-identical results when the default
    backend is CPU (the virtual-mesh / CPU-suite fallback). The default
    backend decides the fallback, so this runs in a CPU-only subprocess."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    worker = tmp_path / "worker.py"
    worker.write_text(
        """
import numpy as np, jax.numpy as jnp
from audio_analysis_tpu.ops import stft as stft_ops
rng = np.random.default_rng(1)
n = 1 << 15
x = rng.standard_normal((2, n)).astype(np.float32)
lengths = jnp.full((2,), n, jnp.int32)
a = stft_ops.stft_magnitude(jnp.asarray(x), lengths, 4096, 512, True, 0.0, "mx")
b = stft_ops.stft_magnitude(jnp.asarray(x), lengths, 4096, 512, True, 0.0, "pallas")
np.testing.assert_array_equal(np.asarray(a.mag), np.asarray(b.mag))
np.testing.assert_array_equal(np.asarray(a.num_frames), np.asarray(b.num_frames))
print("worker ok")
"""
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH", ""), str(repo_root)])
    )
    run = subprocess.run(
        [sys.executable, str(worker)],
        env=env,
        cwd=repo_root,
        capture_output=True,
        timeout=600,
    )
    assert run.returncode == 0, run.stderr.decode()[-2000:]
    assert b"worker ok" in run.stdout
