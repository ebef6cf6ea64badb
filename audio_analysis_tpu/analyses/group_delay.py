"""
Group delay vs frequency from an IR/filter output.

Parity with analyse/group_delay.py: gd(w) = -dphi/dw in samples from the
unwrapped rfft phase (group_delay.py:109-125), FFT next-pow2 capped at 2^20
(group_delay.py:103-105), optional bin smoothing, one plot per channel
`<basename>_groupdelay_<CH>.png`, and the median/p10/p90 summary
(group_delay.py:210-220).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import matplotlib.ticker as mticker
import numpy as np

from audio_analysis_tpu.analyses._common import (
    FileDsp,
    host_aligned_segments,
    single_channel_dsp,
    suffixed_png,
)
from audio_analysis_tpu.ops import spectral, trim
from audio_analysis_tpu.plot import (
    decimate_minmax_log,
    render_line_figure,
)

_MAX_FFT = 1 << 20


@dataclass(frozen=True)
class GroupDelayAnalysisSettings:
    use_mono_downmix_for_stereo: bool = False
    trim_to_peak: bool = True
    ignore_leading_seconds: float = 0.0
    analysis_duration_seconds: Optional[float] = None
    use_hann_window: bool = True
    fft_size: Optional[int] = None  # None -> next pow2 >= segment length (capped 2^20)
    f_min_hz: float = 20.0
    f_max_hz: float = 20000.0
    unwrap_phase: bool = True
    smoothing_bins: int = 0
    # CPU NumPy fallback at the reference's exact FFT size (next pow2 of the
    # SEGMENT length, capped 2^20 — group_delay.py:103-105) instead of the
    # padded bucket; for byte-level cross-tool diffing.
    exact_grid: bool = False


@dataclass(frozen=True)
class GroupDelayPlotSettings:
    secondary_channel_alpha: float = 0.7
    ylim_samples: Optional[Tuple[float, float]] = None
    show_zero_line: bool = True


@dataclass(frozen=True)
class ChannelGroupDelayResult:
    channel_name: str
    sample_rate_hz: int
    frequency_hz: np.ndarray
    group_delay_samples: np.ndarray


def analyse_group_delay_channels(
    dsp: FileDsp,
    settings: GroupDelayAnalysisSettings,
) -> List[ChannelGroupDelayResult]:
    """All channels in one batched phase/gradient dispatch."""
    import jax.numpy as jnp

    sample_rate_hz = dsp.sample_rate_hz
    if settings.exact_grid:
        return _analyse_exact_grid(dsp, settings)

    aligned = dsp.aligned(
        settings.trim_to_peak,
        settings.ignore_leading_seconds,
        settings.analysis_duration_seconds,
    )

    if settings.fft_size is None:
        n_fft = min(dsp.bucket_samples, _MAX_FFT)
    else:
        n_fft = int(settings.fft_size)

    if n_fft != dsp.bucket_samples:
        # cap runtime for very long tails: truncate/pad the aligned segment
        host = np.asarray(aligned.samples)  # (C, N_pad)
        seg = np.zeros((host.shape[0], n_fft), dtype=np.float32)
        take = min(n_fft, host.shape[-1])
        seg[:, :take] = host[:, :take]
        new_len = np.minimum(np.asarray(aligned.length), take).astype(np.int32)
        aligned = trim.AlignedSignal(
            jnp.asarray(seg), jnp.asarray(new_len), aligned.start_index
        )

    r = spectral.group_delay(
        aligned.samples,
        aligned.length,
        sample_rate_hz,
        use_hann_window=settings.use_hann_window,
        unwrap=settings.unwrap_phase,
        smoothing_bins=int(settings.smoothing_bins),
        f_min_hz=float(settings.f_min_hz),
        f_max_hz=float(settings.f_max_hz),
    )

    freq_hz = np.fft.rfftfreq(n_fft, d=1.0 / sample_rate_hz)
    sel = (freq_hz >= settings.f_min_hz) & (freq_hz <= settings.f_max_hz)
    gd_all = np.asarray(r.group_delay_samples)  # (C, F)
    return [
        ChannelGroupDelayResult(
            channel_name=channel_name,
            sample_rate_hz=int(sample_rate_hz),
            frequency_hz=freq_hz[sel].astype(np.float64),
            group_delay_samples=gd_all[i][sel].astype(np.float64),
        )
        for i, channel_name in enumerate(dsp.channel_names)
    ]


def _analyse_exact_grid(
    dsp: FileDsp,
    settings: GroupDelayAnalysisSettings,
) -> List[ChannelGroupDelayResult]:
    """
    Host float64 fallback mirroring the reference exactly
    (group_delay.py:89-131): hann over the exact segment, rfft at next-pow2
    of the SEGMENT length (capped 2^20), unwrap, gd = -dphi/dw in samples,
    optional moving-average smoothing, then the frequency-range mask.
    """
    sample_rate_hz = dsp.sample_rate_hz
    segments, _, _ = host_aligned_segments(
        dsp, settings.trim_to_peak, settings.ignore_leading_seconds,
        settings.analysis_duration_seconds,
    )

    results = []
    for channel_name, x in zip(dsp.channel_names, segments):
        seg = x * np.hanning(x.size) if settings.use_hann_window else x
        if settings.fft_size is None:
            n_fft = 1 << max(0, int(np.ceil(np.log2(max(1, seg.size)))))
            n_fft = min(n_fft, _MAX_FFT)
        else:
            n_fft = int(settings.fft_size)

        spectrum = np.fft.rfft(seg, n=n_fft)
        freq_hz = np.fft.rfftfreq(n_fft, d=1.0 / float(sample_rate_hz))
        phase = np.angle(spectrum)
        if settings.unwrap_phase:
            phase = np.unwrap(phase)
        w = 2.0 * np.pi * (freq_hz / float(sample_rate_hz))  # rad/sample
        gd = -np.gradient(phase, w)
        if settings.smoothing_bins and int(settings.smoothing_bins) > 1:
            kernel = np.ones(int(settings.smoothing_bins)) / float(settings.smoothing_bins)
            gd = np.convolve(gd, kernel, mode="same")

        sel = (freq_hz >= float(settings.f_min_hz)) & (freq_hz <= float(settings.f_max_hz))
        results.append(
            ChannelGroupDelayResult(
                channel_name=channel_name,
                sample_rate_hz=int(sample_rate_hz),
                frequency_hz=freq_hz[sel].astype(np.float64),
                group_delay_samples=gd[sel].astype(np.float64),
            )
        )
    return results


def analyse_group_delay_for_channel(
    samples: np.ndarray,
    sample_rate_hz: int,
    channel_name: str,
    settings: GroupDelayAnalysisSettings,
) -> ChannelGroupDelayResult:
    return analyse_group_delay_channels(
        single_channel_dsp(samples, sample_rate_hz, channel_name), settings
    )[0]


def analyse_group_delay_from_wav_file(
    input_wav_file_path: str | Path,
    settings: Optional[GroupDelayAnalysisSettings] = None,
    dsp: Optional[FileDsp] = None,
) -> List[ChannelGroupDelayResult]:
    if settings is None:
        settings = GroupDelayAnalysisSettings()
    if dsp is None:
        dsp = FileDsp.from_wav_file(input_wav_file_path, settings.use_mono_downmix_for_stereo)
    return analyse_group_delay_channels(dsp, settings)


def plot_group_delay_from_wav_file(
    input_wav_file_path: str | Path,
    settings: Optional[GroupDelayAnalysisSettings] = None,
    plot_settings: Optional[GroupDelayPlotSettings] = None,
    output_basename: Optional[str | Path] = None,
    show_interactive: bool = True,
    dsp: Optional[FileDsp] = None,
) -> List[ChannelGroupDelayResult]:
    if settings is None:
        settings = GroupDelayAnalysisSettings()
    if plot_settings is None:
        plot_settings = GroupDelayPlotSettings()

    results = analyse_group_delay_from_wav_file(input_wav_file_path, settings, dsp=dsp)
    render_group_delay_plots(results, plot_settings, output_basename, show_interactive)
    return results


def render_group_delay_plots(
    results: List[ChannelGroupDelayResult],
    plot_settings: GroupDelayPlotSettings,
    output_basename: Optional[str | Path],
    show_interactive: bool,
) -> None:
    """Figures + save only (host matplotlib); results come from analyse_*.

    Template path mirrors the fresh build exactly — the byte-identity guard
    is tests/test_figure_templates.py."""

    def setup(ax):
        ax.set_xscale("log")
        ax.set_xlabel("Frequency (Hz)")
        ax.set_ylabel("Group delay (samples)")
        ax.xaxis.set_major_formatter(mticker.ScalarFormatter())
        ax.xaxis.set_minor_locator(mticker.NullLocator())  # majors carry the scale
        if plot_settings.ylim_samples is not None:
            ax.set_ylim(*plot_settings.ylim_samples)

    def build_extras(ax):
        if plot_settings.show_zero_line:
            ax.axhline(0.0, linestyle="--", linewidth=1.0)

    for result in results:
        f_plot, g_plot = decimate_minmax_log(
            result.frequency_hz,
            result.group_delay_samples,
            float(result.frequency_hz[0]) if result.frequency_hz.size else 1.0,
            float(result.frequency_hz[-1]) if result.frequency_hz.size else 2.0,
        )
        output_path = (
            None
            if output_basename is None
            else suffixed_png(output_basename, f"_groupdelay_{result.channel_name}")
        )
        render_line_figure(
            "group_delay",
            (plot_settings,),
            f"Group delay ({result.channel_name})",
            [(f_plot, g_plot, {})],
            output_path,
            show_interactive,
            setup=setup,
            build_extras=build_extras,
        )


def summarise_group_delay_results_text(results: List[ChannelGroupDelayResult]) -> str:
    lines: List[str] = []
    for r in results:
        gd = r.group_delay_samples
        if gd.size == 0:
            continue
        lines.append(
            f"- {r.channel_name}: gd median={float(np.median(gd)):.3f} samples, "
            f"p10={float(np.percentile(gd, 10)):.3f}, p90={float(np.percentile(gd, 90)):.3f}"
        )
    if not lines:
        return "No group delay results."
    return "Group delay summary:\n" + "\n".join(lines)
