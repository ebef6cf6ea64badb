"""Report suite + bundle runner."""

from audio_analysis_tpu.report.report import (  # noqa: F401
    ReportResults,
    ReportSettings,
    run_report_from_wav_file,
)
from audio_analysis_tpu.report.bundle import (  # noqa: F401
    BundleRunSettings,
    run_bundle_report,
)
from audio_analysis_tpu.report.engine_report import (  # noqa: F401
    EngineBundleSettings,
    run_bundle_report_engine,
)
from audio_analysis_tpu.report.watch import (  # noqa: F401
    WatchSettings,
    watch_bundle_runs,
)
