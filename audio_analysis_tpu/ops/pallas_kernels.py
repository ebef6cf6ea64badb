"""
Pallas TPU kernels.

schroeder_edc_db_pallas — the Schroeder EDC computed tile-by-tile in VMEM:
square -> masked backward integration -> 10*log10, one (128, 128)-sample
tile per grid step, walking each row END-to-START with a running carry held
in a VMEM scratch that persists across grid steps. The backward cumulative
sum inside a tile is MXU work: a dot with a constant lower-triangular ones
matrix gives all 128 within-block suffixes at once, and a strict-triangular
contraction gives the "strictly after" offsets directly (computing them by
subtraction would catastrophically cancel for fast-decaying signals).

The kernel emits the UNNORMALISED backward integral in dB plus each row's
total energy; the caller subtracts 10*log10(total) and applies the display
floor/mask (one fused elementwise XLA pass). This keeps per-step VMEM at a
few tiles regardless of row length.

Constraints: row length N must be a multiple of 128*128 = 16384; callers
fall back to ops.edc otherwise (see schroeder_edc_db_auto).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TILE = _LANE * _LANE  # samples per grid step


def _suffix_matrices() -> Tuple[np.ndarray, np.ndarray]:
    """(lower, strict): lower[i,j] = 1 iff i >= j; strict[i,j] = 1 iff i > j."""
    lower = np.tril(np.ones((_LANE, _LANE), dtype=np.float32))
    return lower, lower - np.eye(_LANE, dtype=np.float32)


def _edc_kernel(
    lengths_ref,
    lower_ref,
    strict_ref,
    x_ref,
    out_ref,
    carry_ref,
    *,
    num_tiles: int,
    eps: float,
):
    r = pl.program_id(0)
    j = pl.program_id(1)  # walks tiles back-to-front via the index maps
    tile_index = num_tiles - 1 - j  # position of this tile within the row

    @pl.when(j == 0)
    def _():
        carry_ref[0, 0] = 0.0

    length = lengths_ref[r]
    origin = tile_index * _TILE
    idx = origin + (
        jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0) * _LANE
        + jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    )
    tile = x_ref[0, 0]  # (128, 128): 16384 consecutive samples
    energy = jnp.where(idx < length, tile * tile, 0.0)

    lower = lower_ref[:, :]
    strict = strict_ref[:, :]

    # all 128 within-block suffixes at once: (v @ L)[c] = sum_{c'>=c} v[c']
    within = jnp.dot(energy, lower, preferred_element_type=jnp.float32)
    block_totals = within[:, 0:1]  # (128, 1)

    # strictly-after offsets for each block: strict^T contraction + carry
    after = (
        jax.lax.dot_general(
            strict,
            block_totals,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + carry_ref[0, 0]
    )

    edc_unnorm = within + after  # (128, 128) backward integral
    out_ref[0, 0] = 10.0 * jnp.log10(jnp.maximum(edc_unnorm, eps))

    carry_ref[0, 0] = after[0, 0] + block_totals[0, 0]


def supports(n: int) -> bool:
    return n % _TILE == 0 and n > 0


@partial(jax.jit, static_argnames=("eps", "floor_db", "interpret"))
def schroeder_edc_db_pallas(
    samples: jnp.ndarray,
    length: jnp.ndarray,
    eps: float = 1e-20,
    floor_db: float = -120.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """
    samples: (..., N) aligned segments (see ops.trim), zeros past `length`.
    Returns edc_db shaped like samples (0 dB at index 0, floored, zero past
    the valid length) — same contract as ops.edc.schroeder_edc_db.
    """
    n = samples.shape[-1]
    if not supports(n):
        raise ValueError(f"pallas EDC requires N % {_TILE} == 0, got {n}")

    batch_shape = samples.shape[:-1]
    num_tiles = n // _TILE
    tiles = samples.reshape(-1, num_tiles, _LANE, _LANE)
    lengths_flat = jnp.broadcast_to(jnp.asarray(length, jnp.int32), batch_shape).reshape(-1)
    rows = tiles.shape[0]

    lower, strict = _suffix_matrices()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # per-row lengths in SMEM
        grid=(rows, num_tiles),
        in_specs=[
            pl.BlockSpec((_LANE, _LANE), lambda r, j, *_: (0, 0)),
            pl.BlockSpec((_LANE, _LANE), lambda r, j, *_: (0, 0)),
            # walk the row back-to-front so the carry accumulates tail-first
            pl.BlockSpec(
                (1, 1, _LANE, _LANE),
                lambda r, j, *_, nt=num_tiles: (r, nt - 1 - j, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _LANE, _LANE),
            lambda r, j, *_, nt=num_tiles: (r, nt - 1 - j, 0, 0),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )

    log_unnorm = pl.pallas_call(
        partial(_edc_kernel, num_tiles=num_tiles, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, num_tiles, _LANE, _LANE), jnp.float32),
        interpret=interpret,
    )(lengths_flat, jnp.asarray(lower), jnp.asarray(strict), tiles)

    # normalise + floor + mask: one fused elementwise pass. The value at
    # index 0 of the unnormalised curve IS 10*log10(total energy).
    flat_log = log_unnorm.reshape(rows, n)
    edc_db = flat_log - flat_log[:, 0:1]
    edc_db = jnp.maximum(edc_db, floor_db)
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < lengths_flat[:, None]
    edc_db = jnp.where(valid, edc_db, 0.0)
    return edc_db.reshape(samples.shape)


def schroeder_edc_db_auto(
    samples: jnp.ndarray,
    length: jnp.ndarray,
    eps: float = 1e-20,
    floor_db: float = -120.0,
) -> jnp.ndarray:
    """Pallas EDC when the shape qualifies and we're on TPU, else ops.edc.
    Explicit parameters (not **kwargs): the two implementations spell the
    knobs differently (eps/floor_db vs edc_epsilon/edc_floor_db), so a
    pass-through dict only worked for all-default calls."""
    from audio_analysis_tpu.ops import edc as edc_mod

    n = samples.shape[-1]
    from audio_analysis_tpu.ops.common import compute_platform

    if supports(n) and compute_platform() == "tpu":
        return schroeder_edc_db_pallas(samples, length, eps=eps, floor_db=floor_db)
    return edc_mod.schroeder_edc_db(
        samples, length, edc_epsilon=eps, edc_floor_db=floor_db
    ).edc_db
