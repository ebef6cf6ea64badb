"""Shim: analyse.decay -> audio_analysis_tpu.analyses.decay."""
from audio_analysis_tpu.analyses.decay import *  # noqa: F401,F403
