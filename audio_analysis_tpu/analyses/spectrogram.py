"""
Spectrogram (time-frequency magnitude) view.

Parity with analyse/spectrogram.py: same settings/defaults (n_fft 4096,
hop 512, Hann, floor -120 dB, spectrogram.py:37-63), valid framing,
log-frequency pcolormesh with midpoint edges, 99.5th-percentile colour
ceiling minus dynamic range (spectrogram.py:278-289), one PNG per channel
`<basename>_spectrogram_<CH>.png`, summary format (spectrogram.py:390-399).

The STFT itself is the shared batched kernel (ops.stft) — computed once and
reused by report/engine instead of the reference's per-module recompute.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

import numpy as np

from audio_analysis_tpu.analyses._common import load_channels, pad_to_bucket, suffixed_png
from audio_analysis_tpu.ops import stft, trim
from audio_analysis_tpu.plot import (
    apply_log_hz_yaxis,
    create_figure_and_axis,
    finalize_and_show_or_save,
)


@dataclass(frozen=True)
class SpectrogramAnalysisSettings:
    use_mono_downmix_for_stereo: bool = False
    trim_to_peak: bool = True
    ignore_leading_seconds: float = 0.0
    analysis_duration_seconds: Optional[float] = None
    n_fft: int = 4096
    hop_length: int = 512
    use_hann_window: bool = True
    floor_db: float = -120.0
    f_min_hz: float = 20.0
    f_max_hz: float = 20000.0
    dynamic_range_db: Optional[float] = 90.0


@dataclass(frozen=True)
class SpectrogramPlotSettings:
    vmin_db: Optional[float] = None
    vmax_db: Optional[float] = None


@dataclass(frozen=True)
class ChannelSpectrogramResult:
    channel_name: str
    sample_rate_hz: int
    analysis_start_sample_index: int
    analysis_length_samples: int
    time_seconds: np.ndarray  # (T,)
    frequency_hz: np.ndarray  # (F,)
    magnitude_db: np.ndarray  # (F, T)


def analyse_spectrogram_for_channel(
    samples: np.ndarray,
    sample_rate_hz: int,
    channel_name: str,
    settings: SpectrogramAnalysisSettings,
) -> ChannelSpectrogramResult:
    if samples.ndim != 1:
        raise ValueError("analyse_spectrogram_for_channel expects a 1D mono array.")
    if settings.n_fft <= 0 or settings.hop_length <= 0:
        raise ValueError("n_fft and hop_length must be positive.")

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
    if seg_len < settings.n_fft:
        raise ValueError(
            "Not enough samples after trimming/selection for spectrogram (need at least n_fft)."
        )

    result = stft.stft_mag_db(
        aligned.samples,
        aligned.length,
        int(settings.n_fft),
        int(settings.hop_length),
        bool(settings.use_hann_window),
        float(settings.floor_db),
    )
    t_valid = int(np.asarray(result.num_frames)[0])
    mag_db = np.asarray(result.mag_db)[0][:t_valid].T  # (F, T)

    return ChannelSpectrogramResult(
        channel_name=str(channel_name),
        sample_rate_hz=int(sample_rate_hz),
        analysis_start_sample_index=int(np.asarray(aligned.start_index)[0]),
        analysis_length_samples=seg_len,
        time_seconds=stft.frame_times_seconds(t_valid, settings.hop_length, sample_rate_hz),
        frequency_hz=stft.rfft_freqs_hz(settings.n_fft, sample_rate_hz),
        magnitude_db=mag_db.astype(np.float32),
    )


def analyse_spectrogram_from_wav_file(
    input_wav_file_path: str | Path,
    settings: Optional[SpectrogramAnalysisSettings] = None,
) -> List[ChannelSpectrogramResult]:
    if settings is None:
        settings = SpectrogramAnalysisSettings()
    channels, sr = load_channels(input_wav_file_path, settings.use_mono_downmix_for_stereo)
    return [
        analyse_spectrogram_for_channel(ch_samples, sr, ch_name, settings)
        for ch_name, ch_samples in channels
    ]


def _midpoint_edges(values: np.ndarray, fallback_step: float) -> np.ndarray:
    v = values.astype(np.float64)
    if v.size == 1:
        return np.array([v[0], v[0] + fallback_step])
    d = np.diff(v)
    return np.concatenate(([v[0] - 0.5 * d[0]], v[:-1] + 0.5 * d, [v[-1] + 0.5 * d[-1]]))


def plot_spectrogram_figure(
    result: ChannelSpectrogramResult,
    analysis_settings: SpectrogramAnalysisSettings,
    plot_settings: SpectrogramPlotSettings,
    title: Optional[str] = None,
):
    figure, axis = create_figure_and_axis(title=title)

    nyquist = 0.5 * float(result.sample_rate_hz)
    f_min = float(np.clip(analysis_settings.f_min_hz, 1.0, nyquist))
    f_max = float(np.clip(analysis_settings.f_max_hz, f_min, nyquist))

    fmask = (result.frequency_hz >= f_min) & (result.frequency_hz <= f_max)
    freq = result.frequency_hz[fmask]
    mag = result.magnitude_db[fmask, :]
    if mag.size == 0:
        raise ValueError("Spectrogram frequency selection is empty (check f_min_hz/f_max_hz).")

    vmax = (
        float(plot_settings.vmax_db)
        if plot_settings.vmax_db is not None
        else float(np.percentile(mag, 99.5))
    )
    if plot_settings.vmin_db is not None:
        vmin = float(plot_settings.vmin_db)
    elif analysis_settings.dynamic_range_db is not None:
        vmin = vmax - float(analysis_settings.dynamic_range_db)
    else:
        vmin = float(np.percentile(mag, 5.0))

    t_edges = _midpoint_edges(result.time_seconds, 1e-3)
    f_edges = np.maximum(_midpoint_edges(freq, 1.0), 1e-6)

    mesh = axis.pcolormesh(t_edges, f_edges, mag, shading="auto", vmin=vmin, vmax=vmax)
    axis.set_xlabel("Time (s)")
    axis.set_ylabel("Frequency (Hz)")
    axis.set_yscale("log")
    axis.set_ylim(f_min, f_max)
    apply_log_hz_yaxis(axis)
    axis.grid(True, which="both", linestyle=":", linewidth=0.5)
    figure.colorbar(mesh, ax=axis, label="Magnitude (dB)")
    return figure


def plot_spectrogram_from_wav_file(
    input_wav_file_path: str | Path,
    analysis_settings: Optional[SpectrogramAnalysisSettings] = None,
    plot_settings: Optional[SpectrogramPlotSettings] = None,
    output_basename: Optional[str | Path] = None,
    show_interactive: bool = True,
) -> List[ChannelSpectrogramResult]:
    if analysis_settings is None:
        analysis_settings = SpectrogramAnalysisSettings()
    if plot_settings is None:
        plot_settings = SpectrogramPlotSettings()

    results = analyse_spectrogram_from_wav_file(input_wav_file_path, analysis_settings)
    for result in results:
        fig = plot_spectrogram_figure(
            result,
            analysis_settings,
            plot_settings,
            title=f"Spectrogram — {input_wav_file_path} — {result.channel_name}",
        )
        output_path = (
            None
            if output_basename is None
            else suffixed_png(output_basename, f"_spectrogram_{result.channel_name}")
        )
        finalize_and_show_or_save(fig, output_path, show_interactive)
    return results


def summarise_spectrogram_results_text(results: List[ChannelSpectrogramResult]) -> str:
    lines = []
    for r in results:
        duration_s = float(r.analysis_length_samples) / float(r.sample_rate_hz)
        lines.append(
            f"[{r.channel_name}] start_sample={r.analysis_start_sample_index}  "
            f"len_samples={r.analysis_length_samples}  dur={duration_s:.3f}s  "
            f"stft(n_fft={r.magnitude_db.shape[0] * 2 - 2}, frames={r.magnitude_db.shape[1]})"
        )
    return "\n".join(lines)
