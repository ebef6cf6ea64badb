"""Shim: analyse.report -> audio_analysis_tpu.report.report."""
from audio_analysis_tpu.report.report import *  # noqa: F401,F403
from audio_analysis_tpu.report.report import ReportResults, ReportSettings, run_report_from_wav_file  # noqa: F401
