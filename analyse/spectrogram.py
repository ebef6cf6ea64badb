"""Shim: analyse.spectrogram -> audio_analysis_tpu.analyses.spectrogram."""
from audio_analysis_tpu.analyses.spectrogram import *  # noqa: F401,F403
