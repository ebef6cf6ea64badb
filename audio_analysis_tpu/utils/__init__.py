"""Shared utilities: timing/profiling, JSON result emission."""

from audio_analysis_tpu.utils.jsonio import results_to_json, write_results_json  # noqa: F401
from audio_analysis_tpu.utils.timing import BlockTimer, profile_trace  # noqa: F401
