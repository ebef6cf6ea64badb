"""
Host-side WAV I/O with a consistent internal representation.

Capability parity with the reference's analyse/io.py (io.py:36-247):
- float32 samples shaped (num_samples, num_channels) in [-1, 1]
- int16 scaled by 32768, int32 by 2147483648 (io.py:58-64)
- floats clipped to [-1, 1] (io.py:105-111)
- default expected sample rate 48 kHz (io.py:33)
- channel policy "mono" | "stereo" | "mono_or_stereo", optional mono->stereo
  upmix (io.py:156-207)
- stereo analysis channels named "left"/"right", mono downmix 0.5*(L+R)
  named "mono" (io.py:66-95)

Implementation notes (new, not a translation):
- Uses the native C++ loader (libaudioio) when available for fast batched
  decode; falls back to scipy.io.wavfile otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Literal, Tuple

import numpy as np

ChannelMode = Literal["mono", "stereo", "mono_or_stereo"]
DEFAULT_EXPECTED_SAMPLE_RATE_HZ = 48_000

_INT16_SCALE = 32768.0
_INT32_SCALE = 2147483648.0


@dataclass(frozen=True)
class LoadedAudio:
    """Loaded audio in the framework's canonical representation."""

    samples: np.ndarray  # (num_samples, num_channels) float32 in [-1, 1]
    sample_rate_hz: int
    file_path: Path


# ----------------------------------------------------------------------------
# dtype conversion
# ----------------------------------------------------------------------------


def convert_wav_samples_to_float32(samples_from_wav: np.ndarray) -> np.ndarray:
    """Convert any supported WAV dtype to float32 in [-1, 1]."""
    dt = samples_from_wav.dtype
    if np.issubdtype(dt, np.floating):
        out = samples_from_wav.astype(np.float32, copy=False)
    elif dt == np.int16:
        out = samples_from_wav.astype(np.float32) / _INT16_SCALE
    elif dt == np.int32:
        out = samples_from_wav.astype(np.float32) / _INT32_SCALE
    elif dt == np.uint8:
        out = (samples_from_wav.astype(np.float32) - 128.0) / 128.0
    elif np.issubdtype(dt, np.integer):
        raise ValueError(f"Unsupported integer PCM dtype: {dt}")
    else:
        raise ValueError(f"Unsupported WAV dtype: {dt}")
    return np.clip(out, -1.0, 1.0).astype(np.float32)


def ensure_2d_channel_array(float_samples: np.ndarray) -> np.ndarray:
    """Shape samples as (num_samples, num_channels)."""
    if float_samples.ndim == 1:
        return float_samples.reshape((-1, 1))
    if float_samples.ndim == 2:
        return float_samples
    raise ValueError(f"Expected 1D or 2D audio array, got shape {float_samples.shape}")


def duplicate_mono_to_stereo(float_samples: np.ndarray) -> np.ndarray:
    """Upmix mono (N,)/(N,1) to stereo (N,2) by channel duplication."""
    x = ensure_2d_channel_array(np.asarray(float_samples))
    if x.shape[1] == 1:
        return np.repeat(x.astype(np.float32), 2, axis=1)
    if x.shape[1] == 2:
        return x.astype(np.float32)
    raise ValueError(f"Expected mono or stereo for upmix, got {x.shape[1]} channels")


def downmix_to_mono(float_samples: np.ndarray) -> np.ndarray:
    """Average channels down to mono, returned as (N, 1)."""
    x = ensure_2d_channel_array(np.asarray(float_samples))
    return np.mean(x, axis=1, dtype=np.float32).reshape((-1, 1)).astype(np.float32)


# ----------------------------------------------------------------------------
# validation + loading
# ----------------------------------------------------------------------------


def validate_audio_format(
    loaded_audio: LoadedAudio,
    expected_sample_rate_hz: int = DEFAULT_EXPECTED_SAMPLE_RATE_HZ,
    expected_channel_mode: ChannelMode = "stereo",
) -> None:
    """Raise ValueError with an explicit message on any format mismatch."""
    if loaded_audio.sample_rate_hz != expected_sample_rate_hz:
        raise ValueError(
            f"Expected sample rate {expected_sample_rate_hz} Hz, "
            f"but got {loaded_audio.sample_rate_hz} Hz for file {loaded_audio.file_path}"
        )

    channel_count = loaded_audio.samples.shape[1]
    if expected_channel_mode == "mono" and channel_count != 1:
        raise ValueError(
            f"Expected mono (1 channel) but got {channel_count} channels "
            f"for file {loaded_audio.file_path}"
        )
    if expected_channel_mode == "stereo" and channel_count != 2:
        raise ValueError(
            f"Expected stereo (2 channels) but got {channel_count} channels "
            f"for file {loaded_audio.file_path}"
        )
    if expected_channel_mode == "mono_or_stereo" and channel_count not in (1, 2):
        raise ValueError(
            f"Expected mono or stereo (1 or 2 channels) but got {channel_count} "
            f"channels for file {loaded_audio.file_path}"
        )


def read_wav_header_info(path: str | Path) -> Tuple[int, int, int]:
    """
    (frames, channels, sample_rate_hz) from the RIFF header only — no sample
    decode. Used by the multi-host bundle path so every process can agree on
    the padded batch shape while decoding only its own tap shard
    (reference analogue: none; bundle.py:43-53 decodes everything).
    """
    import struct

    path = Path(path)
    with open(path, "rb") as f:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"Not a RIFF/WAVE file: {path}")
        channels = sample_rate = bits = 0
        frames = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            chunk_id, chunk_size = header[:4], struct.unpack("<I", header[4:])[0]
            if chunk_id == b"fmt ":
                if chunk_size < 16 or chunk_size > 65536:
                    raise ValueError(f"Malformed fmt chunk in {path}")
                fmt = f.read(chunk_size)
                if chunk_size & 1:
                    f.seek(1, 1)  # RIFF pad byte
                _, channels, sample_rate = struct.unpack("<HHI", fmt[:8])
                bits = struct.unpack("<H", fmt[14:16])[0]
            elif chunk_id == b"data":
                if channels == 0 or bits == 0:
                    raise ValueError(f"data chunk before fmt in {path}")
                frames = chunk_size // (channels * (bits // 8))
                break
            else:
                f.seek(chunk_size + (chunk_size & 1), 1)
        if frames is None:
            raise ValueError(f"No data chunk found in {path}")
        return int(frames), int(channels), int(sample_rate)


def wav_is_plain_pcm16(path: str | Path) -> bool:
    """
    Header-only check that a WAV holds plain PCM16 samples — the exact
    condition the native planar-i16 decoder accepts (cpp/audioio.cpp:131,
    including WAVE_FORMAT_EXTENSIBLE whose GUID resolves to PCM). Used to
    vet every bundle tap before committing to the pipelined int16 path, so
    a mixed-format bundle falls back to the float32 loader up front instead
    of raising mid-pipeline.
    """
    import struct

    try:
        with open(Path(path), "rb") as f:
            riff = f.read(12)
            if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
                return False
            while True:
                header = f.read(8)
                if len(header) < 8:
                    return False
                chunk_id, chunk_size = header[:4], struct.unpack("<I", header[4:])[0]
                if chunk_id == b"fmt ":
                    if chunk_size < 16 or chunk_size > 65536:
                        return False
                    fmt = f.read(chunk_size)
                    if len(fmt) < 16:
                        return False
                    (format_tag,) = struct.unpack("<H", fmt[:2])
                    (bits,) = struct.unpack("<H", fmt[14:16])
                    if format_tag == 0xFFFE and len(fmt) >= 26:
                        (format_tag,) = struct.unpack("<H", fmt[24:26])
                    return format_tag == 1 and bits == 16
                f.seek(chunk_size + (chunk_size & 1), 1)
    except (OSError, struct.error):
        # a truncated/garbled header is "not plain PCM16", not a crash —
        # callers use this as a cheap vet before the fast i16 path
        return False


def wav_header_info(path: str | Path):
    """Header-only (frames, channels, sample_rate) for a RIFF/WAVE file,
    or None when the header can't be parsed. No PCM data is read — this is
    the probe for batch materialisation (io/bundle.materialize_bundle_view)
    on hosts without the native decoder, where a full scipy decode per file
    would double the batch's decode work."""
    import struct

    try:
        with open(Path(path), "rb") as f:
            riff = f.read(12)
            if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
                return None
            channels = rate = block_align = None
            while True:
                header = f.read(8)
                if len(header) < 8:
                    return None
                chunk_id, chunk_size = header[:4], struct.unpack("<I", header[4:])[0]
                if chunk_id == b"fmt ":
                    if chunk_size < 16 or chunk_size > 65536:
                        return None
                    fmt = f.read(chunk_size)
                    if len(fmt) < 16:
                        return None
                    channels, rate = struct.unpack("<HI", fmt[2:8])
                    (block_align,) = struct.unpack("<H", fmt[12:14])
                    if chunk_size & 1:
                        f.seek(1, 1)  # RIFF chunks are word-aligned
                elif chunk_id == b"data":
                    if not channels or not rate or not block_align:
                        return None  # data before fmt — malformed
                    return chunk_size // block_align, int(channels), int(rate)
                else:
                    f.seek(chunk_size + (chunk_size & 1), 1)
    except (OSError, struct.error):
        return None


_RAW_CACHE: dict = {}
_RAW_CACHE_MAX = 4


def _read_wav_raw(path: Path) -> Tuple[int, np.ndarray]:
    """
    Read a WAV file, preferring the native loader when built.

    A tiny mtime-keyed cache absorbs the reference workflow's repeated
    reads: each report re-opens its input ~10x (once per analysis module,
    report.py:222-398 in the reference); decode once instead.
    """
    key = (str(path), path.stat().st_mtime_ns)
    if key in _RAW_CACHE:
        return _RAW_CACHE[key]

    from audio_analysis_tpu.io import native

    result = None
    if native.available():
        try:
            result = native.read_wav(path)
        except IOError:
            # formats the native decoder doesn't cover (e.g. uint8 PCM)
            # must load identically whether or not cpp/ was built — fall
            # back to the scipy path, which raises its own error if the
            # file is genuinely unreadable
            result = None
    if result is None:
        from scipy.io import wavfile

        try:
            sample_rate_hz, data = wavfile.read(str(path))
        except (IOError, ValueError):
            raise
        except Exception as exc:
            # scipy leaks raw internal errors on malformed headers (fuzzed:
            # UnboundLocalError on a missing fmt chunk, ZeroDivisionError on
            # zero channels/bits) — normalise to the loader's contract
            raise IOError(f"unreadable WAV file {path}: {exc!r}") from exc
        result = (int(sample_rate_hz), data)

    if len(_RAW_CACHE) >= _RAW_CACHE_MAX:
        _RAW_CACHE.pop(next(iter(_RAW_CACHE)))
    _RAW_CACHE[key] = result
    return result


def load_wav_file(
    wav_file_path: str | Path,
    expected_sample_rate_hz: int = DEFAULT_EXPECTED_SAMPLE_RATE_HZ,
    expected_channel_mode: ChannelMode = "stereo",
    allow_mono_and_upmix_to_stereo: bool = True,
) -> LoadedAudio:
    """
    Load a WAV file into the canonical float32 (N, C) representation,
    optionally upmixing mono->stereo, and validate the expected format.
    """
    wav_file_path = Path(wav_file_path)
    sample_rate_hz, raw = _read_wav_raw(wav_file_path)

    float_samples = ensure_2d_channel_array(convert_wav_samples_to_float32(raw))

    if (
        expected_channel_mode == "stereo"
        and allow_mono_and_upmix_to_stereo
        and float_samples.shape[1] == 1
    ):
        float_samples = duplicate_mono_to_stereo(float_samples)

    loaded = LoadedAudio(
        samples=float_samples.astype(np.float32, copy=False),
        sample_rate_hz=int(sample_rate_hz),
        file_path=wav_file_path,
    )
    validate_audio_format(loaded, expected_sample_rate_hz, expected_channel_mode)
    return loaded


# ----------------------------------------------------------------------------
# channel selection
# ----------------------------------------------------------------------------


def get_analysis_channels(
    loaded_audio: LoadedAudio,
    use_mono_downmix_for_stereo: bool = False,
) -> List[Tuple[str, np.ndarray]]:
    """
    Channels to analyse as (name, 1D float32 samples):
    mono input -> [("mono", x)]; stereo -> [("left", L), ("right", R)] or
    [("mono", 0.5*(L+R))] when downmixing.
    """
    channel_count = loaded_audio.samples.shape[1]

    if channel_count == 1:
        return [("mono", loaded_audio.samples[:, 0].astype(np.float32, copy=False))]

    if channel_count == 2:
        left = loaded_audio.samples[:, 0].astype(np.float32, copy=False)
        right = loaded_audio.samples[:, 1].astype(np.float32, copy=False)
        if use_mono_downmix_for_stereo:
            return [("mono", (0.5 * (left + right)).astype(np.float32))]
        return [("left", left), ("right", right)]

    raise ValueError(f"Unsupported channel count: {channel_count}")


def get_channel(loaded_audio: LoadedAudio, channel_index: int) -> np.ndarray:
    """Return one channel as a 1D float32 array."""
    channel_count = loaded_audio.samples.shape[1]
    if not (0 <= channel_index < channel_count):
        raise ValueError(
            f"channel_index out of range: {channel_index} for {channel_count} channels"
        )
    return loaded_audio.samples[:, channel_index].astype(np.float32, copy=False)


def get_left_right(loaded_audio: LoadedAudio) -> Tuple[np.ndarray, np.ndarray]:
    """Return (left, right) 1D arrays; input must be stereo."""
    validate_audio_format(
        loaded_audio,
        expected_sample_rate_hz=loaded_audio.sample_rate_hz,
        expected_channel_mode="stereo",
    )
    return get_channel(loaded_audio, 0), get_channel(loaded_audio, 1)


# ----------------------------------------------------------------------------
# writing
# ----------------------------------------------------------------------------


def write_wav_pcm16(
    output_file_path: str | Path,
    samples_float32: np.ndarray,
    sample_rate_hz: int,
) -> None:
    """
    Write mono (N,)/(N,1) or stereo (N,2) float32 samples as 16-bit PCM WAV
    (clip to [-1,1], scale by 32767 — matches gen/cli.py:74-78 and
    recorder.hpp:49-53).
    """
    x = np.asarray(samples_float32, dtype=np.float32)
    if x.ndim == 2 and x.shape[1] == 1:
        x = x[:, 0]
    if x.ndim not in (1, 2) or (x.ndim == 2 and x.shape[1] != 2):
        raise ValueError(f"Expected mono (N) or stereo (N,2). Got shape {x.shape}")

    int16_samples = (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)

    output_file_path = Path(output_file_path)
    output_file_path.parent.mkdir(parents=True, exist_ok=True)

    from audio_analysis_tpu.io import native

    if native.available():
        native.write_wav_pcm16(output_file_path, int16_samples, int(sample_rate_hz))
        return

    from scipy.io import wavfile

    wavfile.write(str(output_file_path), int(sample_rate_hz), int16_samples)


def write_wav_float32(
    output_file_path: str | Path,
    samples_2d: np.ndarray,
    sample_rate_hz: int,
) -> None:
    """Write float32 WAV (IEEE float), shaped (N, C) — deconvolve.py:110-116."""
    output_file_path = Path(output_file_path)
    output_file_path.parent.mkdir(parents=True, exist_ok=True)

    from scipy.io import wavfile

    wavfile.write(
        str(output_file_path),
        int(sample_rate_hz),
        np.asarray(samples_2d, dtype=np.float32),
    )
