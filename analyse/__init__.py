"""Drop-in compatibility shim for the reference's `analyse` package.

`python -m analyse.cli ...` and the public io API work unchanged; the
implementation is audio_analysis_tpu.
"""

from audio_analysis_tpu.io import (  # noqa: F401
    DEFAULT_EXPECTED_SAMPLE_RATE_HZ,
    LoadedAudio,
    convert_wav_samples_to_float32,
    downmix_to_mono,
    duplicate_mono_to_stereo,
    get_channel,
    get_left_right,
    load_wav_file,
    validate_audio_format,
)

__all__ = [
    "LoadedAudio",
    "DEFAULT_EXPECTED_SAMPLE_RATE_HZ",
    "convert_wav_samples_to_float32",
    "downmix_to_mono",
    "duplicate_mono_to_stereo",
    "get_channel",
    "get_left_right",
    "load_wav_file",
    "validate_audio_format",
]
