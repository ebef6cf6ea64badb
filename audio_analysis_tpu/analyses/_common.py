"""
Shared glue for the single-file analysis path.

Signals are padded to a power-of-two "bucket" so repeated CLI runs over
different file lengths reuse the same compiled kernels (static shapes), and
per-sample validity travels as a length scalar (see ops.common).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from audio_analysis_tpu.io import get_analysis_channels, load_wav_file
from audio_analysis_tpu.ops.common import next_pow2

MIN_BUCKET = 4096


def pad_to_bucket(samples: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    (N,) float -> ((1, N_pad) device array, (1,) int32 length) with
    N_pad = next_pow2(N) (>= MIN_BUCKET).
    """
    x = np.asarray(samples, dtype=np.float32)
    n = x.shape[-1]
    n_pad = max(MIN_BUCKET, next_pow2(n))
    if n_pad != n:
        x = np.concatenate([x, np.zeros(n_pad - n, dtype=np.float32)])
    return jnp.asarray(x[None, :]), jnp.asarray(np.array([n], dtype=np.int32))


def load_channels(
    input_wav_file_path: str | Path,
    use_mono_downmix_for_stereo: bool,
) -> Tuple[List[Tuple[str, np.ndarray]], int]:
    """The shared load policy of every analysis module: mono_or_stereo, no upmix."""
    loaded = load_wav_file(
        wav_file_path=input_wav_file_path,
        expected_channel_mode="mono_or_stereo",
        allow_mono_and_upmix_to_stereo=False,
    )
    channels = get_analysis_channels(loaded, use_mono_downmix_for_stereo)
    return channels, loaded.sample_rate_hz


def suffixed_png(output_basename: str | Path, suffix: str) -> Path:
    """<basename><suffix>.png next to the basename (the PNG suffix contract)."""
    base = Path(output_basename)
    return base.with_name(f"{base.stem}{suffix}.png")
