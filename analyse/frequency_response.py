"""Shim: analyse.frequency_response -> audio_analysis_tpu.analyses.frequency_response."""
from audio_analysis_tpu.analyses.frequency_response import *  # noqa: F401,F403
