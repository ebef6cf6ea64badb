"""Shim: analyse.filterplot -> audio_analysis_tpu.analyses.filterplot."""
from audio_analysis_tpu.analyses.filterplot import *  # noqa: F401,F403
