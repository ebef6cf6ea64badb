"""Shim: analyse.filter_response -> audio_analysis_tpu.analyses.filter_response_study."""
from audio_analysis_tpu.analyses.filter_response_study import *  # noqa: F401,F403
