"""Shim: analyse.waterfall -> audio_analysis_tpu.analyses.waterfall."""
from audio_analysis_tpu.analyses.waterfall import *  # noqa: F401,F403
