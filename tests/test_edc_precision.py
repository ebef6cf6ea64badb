"""
f32 EDC precision characterisation vs the float64 oracle (SURVEY hard parts:
the reversed cumsum of x^2 over ~10^6 samples is the single most
precision-sensitive op, decay.py:151).

Property: at 2^20 samples across RT60 0.1 .. 90 s (the reference's Low-band
golden is 86 s), the f32 kernel EDC must agree with the f64 oracle within
printable precision over the fit-relevant region (>= fit floor -80 dB), and
the derived T30 RT60s must agree to well inside the printed 4 decimals'
significance. Measured numbers are recorded in docs/PERFORMANCE.md.

The flip-cumsum EDC accumulates tail-first (small -> large), which is the
numerically favourable order — this test pins that property.
"""

import numpy as np
import pytest

from audio_analysis_tpu import oracle

SR = 48_000
N = 1 << 20


def _synth(rt60: float) -> np.ndarray:
    rng = np.random.default_rng(int(rt60 * 1000) % 2**31)
    t = np.arange(N) / SR
    env = 10.0 ** (-3.0 * t / rt60)
    x = (0.1 * rng.standard_normal(N) * env).astype(np.float32)
    x[0] = 0.9
    return x


@pytest.mark.parametrize("rt60", [0.1, 1.0, 10.0, 90.0])
def test_edc_f32_matches_f64_oracle_at_2pow20(rt60):
    import jax.numpy as jnp

    from audio_analysis_tpu.ops import dbfit, edc

    x = _synth(rt60)

    # f64 oracle
    t_o, edc_o, _ = oracle.schroeder_edc_db(x.astype(np.float64), SR)
    fit_o = oracle.fit_decay_slope(t_o, edc_o, (-5.0, -35.0))

    # f32 kernel
    xj = jnp.asarray(x[None, :])
    lengths = jnp.asarray(np.array([N], np.int32))
    curve = edc.schroeder_edc_db(xj, lengths)
    edc_k = np.asarray(curve.edc_db)[0]

    # dB agreement over the fit-relevant region (curve above the -80 dB
    # fit floor); below it the reference never fits (decay.py:62).
    region = edc_o >= -80.0
    max_db_err = float(np.max(np.abs(edc_k[region] - edc_o[region])))
    assert max_db_err < 0.02, f"rt60={rt60}: max |ΔdB| {max_db_err}"

    # T30 RT60 agreement
    fit_k = dbfit.fit_decay_slope_over_db_range(
        curve.edc_db, curve.length, (-5.0, -35.0), -80.0, SR
    )
    if fit_o is not None:
        assert bool(np.asarray(fit_k.ok)[0])
        rt_k = float(np.asarray(fit_k.rt60_seconds)[0])
        rt_o = float(fit_o[3])  # (slope, intercept, r2, rt60)
        rel = abs(rt_k - rt_o) / rt_o
        assert rel < 5e-4, f"rt60={rt60}: kernel {rt_k} vs oracle {rt_o} (rel {rel})"
