"""Shim: analyse.diffusion -> audio_analysis_tpu.analyses.diffusion."""
from audio_analysis_tpu.analyses.diffusion import *  # noqa: F401,F403
