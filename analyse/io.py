"""Shim: analyse.io -> audio_analysis_tpu.io.wav."""
from audio_analysis_tpu.io.wav import *  # noqa: F401,F403
from audio_analysis_tpu.io.wav import (  # noqa: F401
    DEFAULT_EXPECTED_SAMPLE_RATE_HZ,
    ChannelMode,
    LoadedAudio,
    get_analysis_channels,
)
