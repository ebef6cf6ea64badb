"""Shared utilities: timing/profiling."""

from audio_analysis_tpu.utils.timing import BlockTimer, profile_trace  # noqa: F401
