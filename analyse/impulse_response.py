"""Shim: analyse.impulse_response -> audio_analysis_tpu.analyses.impulse_response."""
from audio_analysis_tpu.analyses.impulse_response import *  # noqa: F401,F403
