"""Shim: analyse.bundle -> audio_analysis_tpu.report.bundle."""
from audio_analysis_tpu.report.bundle import BundleRunSettings, run_bundle_report  # noqa: F401
