"""
Frequency response / magnitude spectrum view.

Parity with analyse/frequency_response.py: same settings (fr:43-77), Hann
window over the analysed segment, dB floor, optional log-frequency
smoothing (96 bins/oct grid), peak + amplitude-weighted centroid
diagnostics (fr:249-260), `<basename>_fr.png`, and the one-line-per-channel
summary (fr:424-432).

TPU note: the rfft runs at the padded bucket length (zero-padded = denser
sampling of the same windowed DTFT), so the bin grid is finer than the
reference's exact-length FFT; diagnostics agree within a bin width.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import matplotlib.ticker as mticker
import numpy as np

from audio_analysis_tpu.analyses._common import load_channels, pad_to_bucket, suffixed_png
from audio_analysis_tpu.ops import logfreq, spectral, trim
from audio_analysis_tpu.plot import (
    create_figure_and_axis,
    finalize_and_show_or_save,
    hz_tick_formatter,
    label_decibel_axis,
)


@dataclass(frozen=True)
class FrequencyResponseAnalysisSettings:
    use_mono_downmix_for_stereo: bool = False
    trim_to_peak: bool = True
    ignore_leading_seconds: float = 0.0
    analysis_duration_seconds: Optional[float] = None
    use_hann_window: bool = True
    magnitude_floor_db: float = -120.0
    f_min_hz: float = 20.0
    f_max_hz: float = 20000.0
    smoothing_log_bins: int = 0
    log_bins_per_octave: int = 96


@dataclass(frozen=True)
class FrequencyResponsePlotSettings:
    secondary_channel_alpha: float = 0.7
    ylim_db: Optional[Tuple[float, float]] = None


@dataclass(frozen=True)
class ChannelFrequencyResponse:
    channel_name: str
    sample_rate_hz: int
    analysis_start_sample_index: int
    analysis_length_samples: int
    frequency_hz: np.ndarray
    magnitude_db: np.ndarray
    peak_frequency_hz: float
    spectral_centroid_hz: float


def analyse_frequency_response_for_channel(
    samples: np.ndarray,
    sample_rate_hz: int,
    channel_name: str,
    settings: FrequencyResponseAnalysisSettings,
) -> ChannelFrequencyResponse:
    if samples.ndim != 1:
        raise ValueError("analyse_frequency_response_for_channel expects a 1D mono array.")

    x, length = pad_to_bucket(samples)
    aligned = trim.align_for_analysis(
        x,
        length,
        sample_rate_hz,
        settings.trim_to_peak,
        settings.ignore_leading_seconds,
        settings.analysis_duration_seconds,
    )
    seg_len = int(np.asarray(aligned.length)[0])
    if seg_len < 32:
        raise ValueError("Not enough samples after trimming/selection to analyse spectrum.")

    nyquist = 0.5 * sample_rate_hz
    f_min = float(np.clip(settings.f_min_hz, 0.0, nyquist))
    f_max = float(np.clip(settings.f_max_hz, f_min, nyquist))

    spec = spectral.segment_spectrum(
        aligned.samples,
        aligned.length,
        sample_rate_hz,
        use_hann_window=settings.use_hann_window,
        magnitude_floor_db=settings.magnitude_floor_db,
        f_min_hz=f_min,
        f_max_hz=f_max,
        unwrap_phase=False,
    )

    n_pad = x.shape[-1]
    freq_hz = np.fft.rfftfreq(n_pad, d=1.0 / sample_rate_hz).astype(np.float32)
    mag_db = np.asarray(spec.mag_db)[0]

    if settings.smoothing_log_bins and int(settings.smoothing_log_bins) > 1:
        f_min_s = float(np.clip(settings.f_min_hz, 1.0, nyquist))
        f_max_s = float(np.clip(settings.f_max_hz, f_min_s, nyquist))
        import jax.numpy as jnp

        mag_db = np.asarray(
            logfreq.smooth_mag_db_log_frequency(
                freq_hz,
                jnp.asarray(mag_db[None, :]),
                f_min_s,
                f_max_s,
                int(settings.smoothing_log_bins),
                int(settings.log_bins_per_octave),
            )
        )[0]
        # recompute diagnostics on the smoothed curve (fr:238-260)
        sel = (freq_hz >= f_min) & (freq_hz <= f_max)
        if not np.any(sel):
            raise ValueError("Selected frequency range is empty (check f_min_hz/f_max_hz).")
        mag_sel_lin = 10.0 ** (mag_db[sel].astype(np.float64) / 20.0)
        peak_freq = float(freq_hz[sel][np.argmax(mag_db[sel])])
        wsum = float(mag_sel_lin.sum())
        centroid = float((freq_hz[sel] * mag_sel_lin).sum() / wsum) if wsum > 0 else float(
            freq_hz[sel][0]
        )
    else:
        sel = (freq_hz >= f_min) & (freq_hz <= f_max)
        if not np.any(sel):
            raise ValueError("Selected frequency range is empty (check f_min_hz/f_max_hz).")
        peak_freq = float(np.asarray(spec.peak_frequency_hz)[0])
        centroid = float(np.asarray(spec.spectral_centroid_hz)[0])

    return ChannelFrequencyResponse(
        channel_name=channel_name,
        sample_rate_hz=int(sample_rate_hz),
        analysis_start_sample_index=int(np.asarray(aligned.start_index)[0]),
        analysis_length_samples=seg_len,
        frequency_hz=freq_hz,
        magnitude_db=mag_db.astype(np.float32),
        peak_frequency_hz=peak_freq,
        spectral_centroid_hz=centroid,
    )


def analyse_frequency_response_from_wav_file(
    input_wav_file_path: str | Path,
    settings: Optional[FrequencyResponseAnalysisSettings] = None,
) -> List[ChannelFrequencyResponse]:
    if settings is None:
        settings = FrequencyResponseAnalysisSettings()
    channels, sr = load_channels(input_wav_file_path, settings.use_mono_downmix_for_stereo)
    return [
        analyse_frequency_response_for_channel(ch_samples, sr, ch_name, settings)
        for ch_name, ch_samples in channels
    ]


def plot_frequency_response_figure(
    channel_results: List[ChannelFrequencyResponse],
    analysis_settings: FrequencyResponseAnalysisSettings,
    plot_settings: FrequencyResponsePlotSettings,
    title: Optional[str] = None,
):
    figure, axis = create_figure_and_axis(title=title)

    nyquist = 0.5 * float(channel_results[0].sample_rate_hz)
    f_min = float(np.clip(analysis_settings.f_min_hz, 1.0, nyquist))
    f_max = float(np.clip(analysis_settings.f_max_hz, f_min, nyquist))

    axis.set_xscale("log")
    axis.set_xticks([20, 50, 100, 200, 500, 1000, 2000, 5000, 10000, 20000])
    axis.xaxis.set_major_formatter(mticker.FuncFormatter(hz_tick_formatter))
    axis.xaxis.set_minor_formatter(mticker.NullFormatter())
    axis.set_xlabel("Frequency (Hz)")
    label_decibel_axis(axis)

    if plot_settings.ylim_db is not None:
        axis.set_ylim(*plot_settings.ylim_db)
    else:
        vals = [
            r.magnitude_db[(r.frequency_hz >= f_min) & (r.frequency_hz <= f_max)]
            for r in channel_results
        ]
        y = np.concatenate(vals) if vals else np.array([], np.float32)
        if y.size:
            axis.set_ylim(float(np.percentile(y, 1.0)) - 6.0, float(np.percentile(y, 99.5)) + 6.0)

    axis.set_xlim(f_min, f_max)

    for idx, r in enumerate(channel_results):
        alpha = 1.0 if idx == 0 else float(plot_settings.secondary_channel_alpha)
        sel = (r.frequency_hz >= f_min) & (r.frequency_hz <= f_max)
        axis.plot(
            r.frequency_hz[sel],
            r.magnitude_db[sel],
            alpha=alpha,
            label=(
                f"{r.channel_name}  peak={r.peak_frequency_hz:.0f}Hz  "
                f"centroid={r.spectral_centroid_hz:.0f}Hz"
            ),
        )

    axis.grid(True, which="both", linestyle=":", linewidth=0.5)
    axis.legend(loc="best")
    return figure


def plot_frequency_response_from_wav_file(
    input_wav_file_path: str | Path,
    analysis_settings: Optional[FrequencyResponseAnalysisSettings] = None,
    plot_settings: Optional[FrequencyResponsePlotSettings] = None,
    output_basename: Optional[str | Path] = None,
    show_interactive: bool = True,
) -> List[ChannelFrequencyResponse]:
    if analysis_settings is None:
        analysis_settings = FrequencyResponseAnalysisSettings()
    if plot_settings is None:
        plot_settings = FrequencyResponsePlotSettings()

    results = analyse_frequency_response_from_wav_file(input_wav_file_path, analysis_settings)
    figure = plot_frequency_response_figure(
        results,
        analysis_settings,
        plot_settings,
        title=f"Frequency response (spectrum) — {input_wav_file_path}",
    )
    output_path = None if output_basename is None else suffixed_png(output_basename, "_fr")
    finalize_and_show_or_save(figure, output_path, show_interactive)
    return results


def summarise_frequency_response_results_text(
    channel_results: List[ChannelFrequencyResponse],
) -> str:
    return "\n".join(
        f"[{r.channel_name}] start_sample={r.analysis_start_sample_index}  "
        f"len_samples={r.analysis_length_samples}  "
        f"peak={r.peak_frequency_hz:.1f}Hz  centroid={r.spectral_centroid_hz:.1f}Hz"
        for r in channel_results
    )
