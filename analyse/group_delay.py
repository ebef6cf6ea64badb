"""Shim: analyse.group_delay -> audio_analysis_tpu.analyses.group_delay."""
from audio_analysis_tpu.analyses.group_delay import *  # noqa: F401,F403
