"""Pallas EDC kernel vs the jnp kernel (interpret mode on CPU, native on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_analysis_tpu.ops import edc, pallas_kernels


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def test_supports():
    assert pallas_kernels.supports(16384)
    assert pallas_kernels.supports(1 << 20)
    assert not pallas_kernels.supports(8192)
    assert not pallas_kernels.supports(16384 + 128)


def test_pallas_edc_matches_jnp():
    n = 16384
    rng = np.random.default_rng(0)
    x = np.zeros((2, 2, n), np.float32)
    t = np.arange(n)
    for b in range(2):
        for c in range(2):
            x[b, c] = 0.1 * rng.standard_normal(n) * np.exp(-t / (3000 + 1000 * b))
    lengths = np.array([[n, n], [n // 2, n]], np.int32)
    x[1, 0, n // 2:] = 0.0

    ref = edc.schroeder_edc_db(jnp.asarray(x), jnp.asarray(lengths))
    got = pallas_kernels.schroeder_edc_db_pallas(
        jnp.asarray(x), jnp.asarray(lengths), interpret=_interpret()
    )

    ref_np = np.asarray(ref.edc_db)
    got_np = np.asarray(got)
    # compare over the usable dynamic range (tiny absolute values near the
    # floor differ in last-ulp accumulation order)
    usable = ref_np > -100.0
    np.testing.assert_allclose(got_np[usable], ref_np[usable], atol=0.02)
    # masked region identical
    assert np.all(got_np[1, 0, n // 2:] == 0.0)


def test_pallas_edc_monotone_for_decay():
    """EDC of a pure decaying exponential must be monotone nonincreasing."""
    n = 16384
    t = np.arange(n)
    x = (np.exp(-t / 2000.0)).astype(np.float32)[None, :]
    got = np.asarray(
        pallas_kernels.schroeder_edc_db_pallas(
            jnp.asarray(x), jnp.asarray([n], jnp.int32), interpret=_interpret()
        )
    )[0]
    assert got[0] == 0.0 or abs(got[0]) < 1e-4
    diffs = np.diff(got[: n - 100])
    assert np.all(diffs <= 1e-3)
