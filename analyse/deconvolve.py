"""Shim: analyse.deconvolve -> audio_analysis_tpu.analyses.deconvolve."""
from audio_analysis_tpu.analyses.deconvolve import *  # noqa: F401,F403
