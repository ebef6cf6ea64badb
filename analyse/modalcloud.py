"""Shim: analyse.modalcloud -> audio_analysis_tpu.analyses.modalcloud."""
from audio_analysis_tpu.analyses.modalcloud import *  # noqa: F401,F403
