"""
FFT-domain filterbank with raised-cosine transitions.

Same filter definitions as the reference's rt60bands (rt60bands.py:116-175:
half-cosine ramps in linear frequency between band edge and edge*2^±trans),
but the masks for ALL bands are built as one (bands, F) matrix on the host
and applied with a single batched rfft/irfft — the reference loops bands and
runs a full-length FFT per band (rt60bands.py:362-406).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BandDefinition:
    name: str
    centre_hz: float
    kind: str  # "lowpass" | "bandpass" | "highpass"
    low_edge_hz: Optional[float] = None
    high_edge_hz: Optional[float] = None


# ----------------------------------------------------------------------------
# host-side mask construction (tiny, static per settings)
# ----------------------------------------------------------------------------


def _ramp(freqs: np.ndarray, x0: float, x1: float) -> np.ndarray:
    if x1 <= x0:
        return (freqs >= x1).astype(np.float64)
    t = np.clip((freqs - x0) / (x1 - x0), 0.0, 1.0)
    return 0.5 - 0.5 * np.cos(np.pi * t)


def make_lowpass_mask(
    freqs: np.ndarray, pass_hz: float, transition_oct: float, nyquist_hz: float
) -> np.ndarray:
    pass_hz = float(np.clip(pass_hz, 1.0, nyquist_hz))
    stop_hz = float(min(nyquist_hz, pass_hz * 2.0**transition_oct))
    if stop_hz <= pass_hz:
        stop_hz = min(nyquist_hz, pass_hz + 1.0)
    mask = 1.0 - _ramp(freqs, pass_hz, stop_hz)
    mask[freqs <= pass_hz] = 1.0
    mask[freqs >= stop_hz] = 0.0
    return mask


def make_highpass_mask(
    freqs: np.ndarray, pass_hz: float, transition_oct: float, nyquist_hz: float
) -> np.ndarray:
    pass_hz = float(np.clip(pass_hz, 1.0, nyquist_hz))
    stop_hz = float(max(1.0, pass_hz / 2.0**transition_oct))
    if pass_hz <= stop_hz:
        stop_hz = max(1.0, pass_hz - 1.0)
    mask = _ramp(freqs, stop_hz, pass_hz)
    mask[freqs <= stop_hz] = 0.0
    mask[freqs >= pass_hz] = 1.0
    return mask


def make_bandpass_mask(
    freqs: np.ndarray,
    low_edge_hz: float,
    high_edge_hz: float,
    transition_oct: float,
    nyquist_hz: float,
) -> np.ndarray:
    low_edge_hz = float(np.clip(low_edge_hz, 1.0, nyquist_hz))
    high_edge_hz = float(np.clip(high_edge_hz, 1.0, nyquist_hz))
    if high_edge_hz <= low_edge_hz:
        return np.zeros_like(freqs)
    return make_highpass_mask(freqs, low_edge_hz, transition_oct, nyquist_hz) * make_lowpass_mask(
        freqs, high_edge_hz, transition_oct, nyquist_hz
    )


def build_band_mask_matrix(
    bands: List[BandDefinition],
    num_samples: int,
    sample_rate_hz: int,
    transition_width_octaves: float,
) -> np.ndarray:
    """(bands, F) float32 mask matrix for rfft of length `num_samples`."""
    freqs = np.fft.rfftfreq(num_samples, d=1.0 / float(sample_rate_hz))
    nyquist = 0.5 * float(sample_rate_hz)
    rows = []
    for band in bands:
        if band.kind == "lowpass":
            rows.append(
                make_lowpass_mask(freqs, band.high_edge_hz, transition_width_octaves, nyquist)
            )
        elif band.kind == "highpass":
            rows.append(
                make_highpass_mask(freqs, band.low_edge_hz, transition_width_octaves, nyquist)
            )
        elif band.kind == "bandpass":
            rows.append(
                make_bandpass_mask(
                    freqs, band.low_edge_hz, band.high_edge_hz, transition_width_octaves, nyquist
                )
            )
        else:
            raise ValueError(f"Unknown band kind: {band.kind}")
    return np.stack(rows, axis=0).astype(np.float32)


# ----------------------------------------------------------------------------
# band definition generation (rt60bands.py:183-253 semantics)
# ----------------------------------------------------------------------------


def build_three_band_definitions(
    sample_rate_hz: int,
    low_upper_hz: float = 250.0,
    mid_center_hz: float = 1000.0,
    mid_width_octaves: float = 2.0,
    high_lower_hz: float = 4000.0,
) -> List[BandDefinition]:
    nyquist = 0.5 * float(sample_rate_hz)
    low_upper = float(np.clip(low_upper_hz, 20.0, nyquist))
    mid_center = float(np.clip(mid_center_hz, 20.0, nyquist))
    mid_width = float(max(0.1, mid_width_octaves))
    high_lower = float(np.clip(high_lower_hz, 20.0, nyquist))

    half = 0.5 * mid_width
    mid_low = float(np.clip(mid_center / 2.0**half, 20.0, nyquist))
    mid_high = float(np.clip(mid_center * 2.0**half, 20.0, nyquist))

    return [
        BandDefinition("Low", float(np.sqrt(20.0 * low_upper)), "lowpass", high_edge_hz=low_upper),
        BandDefinition("Mid", mid_center, "bandpass", low_edge_hz=mid_low, high_edge_hz=mid_high),
        BandDefinition(
            "High",
            float(np.sqrt(max(20.0, high_lower) * nyquist)),
            "highpass",
            low_edge_hz=high_lower,
        ),
    ]


def build_fractional_octave_band_definitions(
    sample_rate_hz: int,
    bands_per_octave: int,
    f_min_hz: float = 31.5,
    f_max_hz: float = 16000.0,
) -> List[BandDefinition]:
    """Centres at 1000 * 2^(k/n), edges at fc * 2^(±1/(2n)), clipped to range."""
    nyquist = 0.5 * float(sample_rate_hz)
    f_min = float(max(20.0, min(f_min_hz, nyquist)))
    f_max = float(max(f_min, min(f_max_hz, nyquist)))

    n = float(bands_per_octave)
    step = 2.0 ** (1.0 / n)
    half_band = 2.0 ** (1.0 / (2.0 * n))
    anchor = 1000.0

    k_min = int(np.floor(np.log(f_min / anchor) / np.log(step)))
    k_max = int(np.ceil(np.log(f_max / anchor) / np.log(step)))

    bands: List[BandDefinition] = []
    for k in range(k_min, k_max + 1):
        fc = anchor * step**k
        if fc < f_min or fc > f_max:
            continue
        low = float(np.clip(fc / half_band, 20.0, nyquist))
        high = float(np.clip(fc * half_band, 20.0, nyquist))
        if high <= low:
            continue
        bands.append(
            BandDefinition(f"{int(round(fc))}Hz", float(fc), "bandpass", low, high)
        )
    bands.sort(key=lambda b: b.centre_hz)
    return bands


# ----------------------------------------------------------------------------
# device-side batched application
# ----------------------------------------------------------------------------


def apply_band_masks(x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """
    x: (..., N) real signal; masks: (bands, F) with F = N//2 + 1.
    Returns (..., bands, N): all bands filtered with ONE batched rfft+irfft.

    Stereo fast path: when the second-to-last axis is exactly 2 (an L/R
    pair) and N is even, the pair packs into ONE complex signal z = L + iR —
    a real, even (conjugate-symmetric) filter commutes with the packing, so
    one c2c fft + one c2c ifft per band yields BOTH channels' band signals
    (real part = L, imag = R). Exact in exact arithmetic; halves the FFT
    work where the TPU FFT doesn't exploit real-input symmetry.
    """
    n = x.shape[-1]
    if x.ndim >= 2 and x.shape[-2] == 2 and n % 2 == 0:
        return _apply_band_masks_packed_stereo(x, masks, n)
    spectrum = jnp.fft.rfft(x, axis=-1)  # (..., F)
    banded = spectrum[..., None, :] * masks  # (..., bands, F)
    return jnp.fft.irfft(banded, n=n, axis=-1).astype(jnp.float32)


def _apply_band_masks_packed_stereo(x: jnp.ndarray, masks: jnp.ndarray, n: int) -> jnp.ndarray:
    """(..., 2, N) real -> (..., 2, bands, N) via the L + iR c2c packing."""
    z = jax.lax.complex(x[..., 0, :], x[..., 1, :])  # (..., N)
    spectrum = jnp.fft.fft(z, axis=-1)  # (..., N)
    # mirror the rfft-half mask to the full spectrum: mask_full[k] = mask[N-k]
    # for k > N/2 (reverse of the interior — a cheap flip, NOT a gather)
    masks_full = jnp.concatenate([masks, masks[:, 1:-1][:, ::-1]], axis=-1)  # (bands, N)
    z_banded = jnp.fft.ifft(spectrum[..., None, :] * masks_full, axis=-1)  # (..., bands, N)
    return jnp.stack(
        [jnp.real(z_banded), jnp.imag(z_banded)], axis=-3
    ).astype(jnp.float32)
