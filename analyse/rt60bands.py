"""Shim: analyse.rt60bands -> audio_analysis_tpu.analyses.rt60bands."""
from audio_analysis_tpu.analyses.rt60bands import *  # noqa: F401,F403
