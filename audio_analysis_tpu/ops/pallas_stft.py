"""
Fused Pallas STFT magnitude kernel.

One grid step computes a tile of TF frames for one (tap, channel) row
entirely in VMEM: overlap framing, window multiply, a two-stage
N = nr*64 DFT factorisation (same math as ops/mxfft.rfft_mx) and
|magnitude|^2 — the (T, n_fft) frame matrix and the complex spectrum
NEVER touch HBM. Only the signal (read ~2x) and the magnitude plane
(written once, in (c, t, d) kernel order, reordered to rfft bin order by
one XLA transpose outside) cross the HBM boundary.

Mosaic-friendliness dictates the structure:
- With hop | n_fft and the signal viewed as 64-wide rows
  (y64 = x.reshape(-1, 64)), frame t is the CONTIGUOUS sublane-aligned
  row block y64[(hop//64)*t : (hop//64)*t + nr] — framing is static
  aligned slices, no gathers.
- Mosaic supports only 2D matmuls, and lane-dim reshapes are illegal. So
  frames are processed in GROUPS of G: G windowed frame blocks (nr, 64)
  are lane-concatenated into (nr, G*64), stage 1 is one dense
  (nr, nr) @ (nr, G*64) matmul, the twiddle is a pre-tiled Hadamard, and
  stage 2 contracts each frame's 64 s-lanes with a BLOCK-DIAGONAL
  (G*64, G*d_max) table — 2x padded FLOPs, but dense MXU shapes and zero
  layout changes. Group outputs lane-concatenate into the tile plane.

No reference counterpart (the reference loops np.fft.rfft per frame on
CPU, spectrogram.py:146-155). MEASURED OUTCOME (one v5e chip, 32 rows x
2^20 samples, full-plane + max): pallas 67 ms vs mx 59 ms vs XLA 80 ms at
n_fft 4096 — parity with the mx matmul-FFT path, not a win; the grouped
(nr, G*64) matmuls are MXU-latency-bound and the saved frame/spectrum HBM
traffic (~4 ms) doesn't cover that. Kept as an OPT-IN
(EngineConfig.stft_fft_impl="pallas", falls back to "mx" off-TPU and
under shard_map) with exact-accuracy tests; the engine default remains
"mx". Larger tiles (TF=256/G=16) exceed the 16 MB VMEM scoped limit.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)

_G = 8  # frames per stage-1/2 matmul group


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def supports(n_fft: int, hop: int) -> bool:
    """Power-of-two n_fft >= 4096, hop a multiple of 64 dividing n_fft,
    two-block tile coverage, group-divisible tiles."""
    if n_fft < 4096 or n_fft & (n_fft - 1) or hop <= 0:
        return False
    if n_fft % hop or hop % 64:
        return False
    tf = _frames_per_tile(n_fft)
    return n_fft - hop <= tf * hop and tf % _G == 0


def _frames_per_tile(n_fft: int) -> int:
    return 128 if n_fft <= 4096 else 64


@lru_cache(maxsize=8)
def _tables(n_fft: int, use_hann: bool):
    nr = n_fft // 64  # stage-1 factor (the r axis); s axis is 64 lanes
    f = n_fft // 2 + 1
    # bin k = nr*d + c, c in [0, nr): d_max covers the rfft half (even pad)
    d_max = _cdiv(_cdiv(f, nr), 2) * 2
    r = np.arange(nr)
    s = np.arange(64)
    d = np.arange(d_max)
    f1 = np.exp(-2j * np.pi * np.outer(r, r) / nr)  # [c, r]
    tw = np.exp(-2j * np.pi * np.outer(r, s) / n_fft)  # [c, s]
    f2 = np.exp(-2j * np.pi * np.outer(s, d % 64) / 64.0)  # [s, d]

    # group-tiled twiddle (c, G*64) and block-diagonal stage-2 (G*64, G*dm)
    twc_g = np.tile(tw.real, (1, _G)).astype(np.float32)
    tws_g = np.tile(tw.imag, (1, _G)).astype(np.float32)
    f2c_g = np.zeros((_G * 64, _G * d_max), np.float32)
    f2s_g = np.zeros((_G * 64, _G * d_max), np.float32)
    for g in range(_G):
        f2c_g[g * 64 : (g + 1) * 64, g * d_max : (g + 1) * d_max] = f2.real
        f2s_g[g * 64 : (g + 1) * 64, g * d_max : (g + 1) * d_max] = f2.imag

    window = np.hanning(n_fft) if use_hann else np.ones(n_fft)
    return dict(
        f1c=f1.real.astype(np.float32),
        f1s=f1.imag.astype(np.float32),
        twc_g=twc_g,
        tws_g=tws_g,
        f2c_g=f2c_g,
        f2s_g=f2s_g,
        w2d=window.astype(np.float32).reshape(nr, 64),
        nr=nr,
        d_max=d_max,
    )


def _stft_kernel(
    xb0_ref,
    xb1_ref,
    w2d_ref,
    f1c_ref,
    f1s_ref,
    twcg_ref,
    twsg_ref,
    f2cg_ref,
    f2sg_ref,
    out_ref,
    *,
    hop: int,
    tf: int,
    nr: int,
    d_max: int,
):
    step = hop // 64
    y64 = jnp.concatenate([xb0_ref[0], xb1_ref[0]], axis=0)  # (2*TF*step, 64)
    w2d = w2d_ref[:, :]
    f1c = f1c_ref[:, :]
    f1s = f1s_ref[:, :]
    twc = twcg_ref[:, :]
    tws = twsg_ref[:, :]
    f2c = f2cg_ref[:, :]
    f2s = f2sg_ref[:, :]

    group_outs = []
    for g0 in range(0, tf, _G):
        # G windowed frame blocks, lane-concatenated: (nr, G*64)
        zg = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    y64, step * (g0 + t), step * (g0 + t) + nr, axis=0
                )
                * w2d
                for t in range(_G)
            ],
            axis=1,
        )
        # stage 1 (contract r): (nr, nr) @ (nr, G*64) -> (c, (t, s))
        yr = jnp.dot(
            f1c, zg, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        yi = jnp.dot(
            f1s, zg, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # twiddle W_N^{s c} (pre-tiled per group position)
        ypr = yr * twc - yi * tws
        ypi = yr * tws + yi * twc
        # stage 2 (contract s, per frame): block-diagonal (G*64, G*dm)
        hi = jax.lax.Precision.HIGHEST
        xr = jnp.dot(
            ypr, f2c, preferred_element_type=jnp.float32, precision=hi
        ) - jnp.dot(ypi, f2s, preferred_element_type=jnp.float32, precision=hi)
        xi = jnp.dot(
            ypr, f2s, preferred_element_type=jnp.float32, precision=hi
        ) + jnp.dot(ypi, f2c, preferred_element_type=jnp.float32, precision=hi)
        group_outs.append(xr * xr + xi * xi)  # (nr, G*d_max), cols (t, d)

    out_ref[0, 0] = jnp.concatenate(group_outs, axis=1)  # (nr, tf*d_max)


@partial(jax.jit, static_argnames=("n_fft", "hop", "use_hann_window", "interpret"))
def stft_magnitude_pallas(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    use_hann_window: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """
    (..., N) float32 -> (..., T, F) linear |STFT| with the reference's
    "valid" framing T = 1 + (N - n_fft)//hop, F = n_fft//2 + 1. Matches
    |jnp.fft.rfft(window * frames)| to ~1e-6 relative. No flooring or
    frame masking — callers apply their own (ops.stft.stft_magnitude).
    """
    if not supports(n_fft, hop):
        raise ValueError(f"unsupported (n_fft={n_fft}, hop={hop})")
    f_bins = n_fft // 2 + 1
    n = x.shape[-1]
    t = 1 + (n - n_fft) // hop if n >= n_fft else 0
    if t <= 0:
        return jnp.zeros(x.shape[:-1] + (0, f_bins), jnp.float32)

    tab = _tables(n_fft, use_hann_window)
    nr, d_max = tab["nr"], tab["d_max"]
    tf = _frames_per_tile(n_fft)
    block = tf * hop
    tiles = _cdiv(t, tf)

    batch_shape = x.shape[:-1]
    rows = int(np.prod(batch_shape)) if batch_shape else 1
    xf = x.reshape(rows, n).astype(jnp.float32)
    n_pad = (tiles + 1) * block
    if n < n_pad:
        xf = jnp.pad(xf, ((0, 0), (0, n_pad - n)))
    else:
        xf = xf[:, :n_pad]
    xb = xf.reshape(rows, (tiles + 1) * block // 64, 64)

    consts = [
        jnp.asarray(tab["w2d"]),
        jnp.asarray(tab["f1c"]),
        jnp.asarray(tab["f1s"]),
        jnp.asarray(tab["twc_g"]),
        jnp.asarray(tab["tws_g"]),
        jnp.asarray(tab["f2c_g"]),
        jnp.asarray(tab["f2s_g"]),
    ]
    const_specs = [pl.BlockSpec(c.shape, lambda r, j: (0, 0)) for c in consts]
    rows_per_block = block // 64

    power = pl.pallas_call(
        partial(_stft_kernel, hop=hop, tf=tf, nr=nr, d_max=d_max),
        grid=(rows, tiles),
        in_specs=[
            pl.BlockSpec((1, rows_per_block, 64), lambda r, j: (r, j, 0)),
            pl.BlockSpec((1, rows_per_block, 64), lambda r, j: (r, j + 1, 0)),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, nr, tf * d_max), lambda r, j: (r, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, tiles, nr, tf * d_max), jnp.float32),
        interpret=interpret,
    )(xb, xb, *consts)

    # kernel plane is [c, (t, d)]; rfft bin k = nr*d + c -> host-side
    # reshape + transpose to [t, d, c], flatten, slice the padded bins
    mag = jnp.sqrt(
        jnp.transpose(
            power.reshape(rows, tiles, nr, tf, d_max), (0, 1, 3, 4, 2)
        ).reshape(rows, tiles * tf, d_max * nr)[:, :t, :f_bins]
    )
    return mag.reshape(batch_shape + (t, f_bins))
