"""Shim: analyse.plotting -> audio_analysis_tpu.plot."""
from audio_analysis_tpu.plot import *  # noqa: F401,F403
from audio_analysis_tpu.plot import (  # noqa: F401
    DEFAULT_DPI,
    DEFAULT_FIGURE_SIZE,
    create_figure_and_axis,
    finalize_and_show_or_save,
    label_amplitude_axis,
    label_decibel_axis,
    label_frequency_axis_hz,
    label_time_axis_seconds,
    plot_log_magnitude_over_time,
    plot_scatter,
    plot_spectrogram,
    plot_time_series,
    plot_waterfall_lines,
    time_axis_from_sample_count,
)
