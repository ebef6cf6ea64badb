"""
Decay-curve metrology: interpolated dB crossings and masked least-squares
line fits over dB ranges (slope, r^2, RT60 = -60/slope).

Same definitions as the reference (decay.py:173-260) but fully vectorised:
the crossing search is a masked argmax, the fit window becomes a weight
mask, and the line fit is a closed-form centred weighted least squares —
numerically identical to lstsq on the 2-column design, batched over any
leading dims (taps x channels x bands x bins at once).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from audio_analysis_tpu.ops.common import bool_valid_mask


class Crossing(NamedTuple):
    time_seconds: jnp.ndarray  # (...,) f32 (garbage where not found)
    found: jnp.ndarray  # (...,) bool


class DecayFit(NamedTuple):
    slope_db_per_second: jnp.ndarray
    intercept_db: jnp.ndarray
    r_squared: jnp.ndarray
    rt60_seconds: jnp.ndarray
    start_time_seconds: jnp.ndarray
    end_time_seconds: jnp.ndarray
    num_points: jnp.ndarray  # int32
    ok: jnp.ndarray  # bool: valid fit (range found, >= min points, slope < 0)


@partial(jax.jit, static_argnames=("sample_rate_hz",))
def crossing_time(
    curve_db: jnp.ndarray,
    length: jnp.ndarray,
    target_db: float | jnp.ndarray,
    sample_rate_hz: float,
) -> Crossing:
    """
    First time the curve reaches <= target_db, linearly interpolated between
    the bracketing samples (decay.py:173-199). Time axis is index/sr.
    """
    n = curve_db.shape[-1]
    valid = bool_valid_mask(n, length)
    target = jnp.asarray(target_db, dtype=curve_db.dtype)

    below = (curve_db <= target[..., None]) & valid
    found = jnp.any(below, axis=-1)
    idx = jnp.argmax(below, axis=-1)  # first True

    prev = jnp.maximum(idx - 1, 0)
    y0 = jnp.take_along_axis(curve_db, prev[..., None], axis=-1)[..., 0]
    y1 = jnp.take_along_axis(curve_db, idx[..., None], axis=-1)[..., 0]

    t0 = prev.astype(jnp.float32) / sample_rate_hz
    t1 = idx.astype(jnp.float32) / sample_rate_hz
    frac = jnp.clip((target - y0) / jnp.where(y1 == y0, 1.0, y1 - y0), 0.0, 1.0)
    t_interp = jnp.where(y1 == y0, t1, t0 + frac * (t1 - t0))
    t = jnp.where(idx == 0, 0.0, t_interp)
    return Crossing(t.astype(jnp.float32), found)


@partial(jax.jit, static_argnames=("range_db", "fit_lower_limit_db", "sample_rate_hz", "min_points"))
def fit_decay_slope_over_db_range(
    curve_db: jnp.ndarray,
    length: jnp.ndarray,
    range_db: Tuple[float, float],
    fit_lower_limit_db: float,
    sample_rate_hz: float,
    min_points: int = 8,
) -> DecayFit:
    """
    Fit y = m t + b over the curve section between the interpolated crossings
    of range_db[0] (higher) and max(range_db[1], fit_lower_limit_db), reject
    non-decaying fits, derive RT60 = -60/m (decay.py:202-260).
    """
    high_db, low_db = float(range_db[0]), float(range_db[1])
    effective_low_db = max(low_db, float(fit_lower_limit_db))

    start = crossing_time(curve_db, length, high_db, sample_rate_hz)
    end = crossing_time(curve_db, length, effective_low_db, sample_rate_hz)

    n = curve_db.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32) / sample_rate_hz
    valid = bool_valid_mask(n, length)
    window = (
        valid
        & (t >= start.time_seconds[..., None])
        & (t <= end.time_seconds[..., None])
    )
    num = jnp.sum(window, axis=-1).astype(jnp.int32)
    num_safe = jnp.maximum(num, 1).astype(jnp.float32)

    # Centred weighted least squares (identical to lstsq on [t, 1]).
    y = jnp.where(window, curve_db, 0.0)
    tw = jnp.where(window, t, 0.0)
    t_mean = jnp.sum(tw, axis=-1) / num_safe
    y_mean = jnp.sum(y, axis=-1) / num_safe
    dt = jnp.where(window, t - t_mean[..., None], 0.0)
    dy = jnp.where(window, curve_db - y_mean[..., None], 0.0)

    s_tt = jnp.sum(dt * dt, axis=-1)
    s_ty = jnp.sum(dt * dy, axis=-1)
    slope = s_ty / jnp.where(s_tt > 0.0, s_tt, 1.0)
    intercept = y_mean - slope * t_mean

    resid = jnp.where(window, dy - slope[..., None] * dt, 0.0)
    ss_res = jnp.sum(resid * resid, axis=-1)
    ss_tot = jnp.sum(dy * dy, axis=-1)
    r2 = jnp.where(ss_tot > 0.0, 1.0 - ss_res / jnp.where(ss_tot > 0.0, ss_tot, 1.0), 0.0)

    ok = (
        start.found
        & end.found
        & (end.time_seconds > start.time_seconds)
        & (num >= min_points)
        & (slope < 0.0)
        & (s_tt > 0.0)
    )
    rt60 = -60.0 / jnp.where(slope < 0.0, slope, -1.0)

    return DecayFit(
        slope_db_per_second=slope,
        intercept_db=intercept,
        r_squared=r2,
        rt60_seconds=rt60,
        start_time_seconds=start.time_seconds,
        end_time_seconds=end.time_seconds,
        num_points=num,
        ok=ok,
    )
