"""Shim: analyse.zplane -> audio_analysis_tpu.analyses.zplane."""
from audio_analysis_tpu.analyses.zplane import *  # noqa: F401,F403
