"""
Shared host-side plotting helpers (matplotlib).

The plot contract mirrors the reference (analyse/plotting.py:25-227):
10x6 in @100 dpi figures, grid on, save-PNG-and-close when an output path
is given, otherwise interactive show; plus the human-readable Hz tick
treatment used by every log-frequency plot.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import matplotlib

matplotlib.use("Agg", force=False)  # headless-safe; overridable by user env

import matplotlib.pyplot as plt  # noqa: E402
import matplotlib.ticker as mticker  # noqa: E402
import numpy as np  # noqa: E402

from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class FigureStyle:
    """House style for every figure the framework emits (10x6 in @ 100 dpi,
    grid on — the same visual contract as the reference toolkit's plots)."""

    width_inches: float = 10.0
    height_inches: float = 6.0
    dpi: int = 100
    grid: bool = True

    @property
    def size(self) -> Tuple[float, float]:
        return (self.width_inches, self.height_inches)


HOUSE_STYLE = FigureStyle()

# Back-compat constants (several analyses read these directly).
DEFAULT_FIGURE_SIZE = HOUSE_STYLE.size
DEFAULT_DPI = HOUSE_STYLE.dpi
DEFAULT_GRID = HOUSE_STYLE.grid


def create_figure_and_axis(
    title: Optional[str] = None,
    figure_size: Tuple[float, float] = DEFAULT_FIGURE_SIZE,
    style: FigureStyle = HOUSE_STYLE,
) -> Tuple[plt.Figure, plt.Axes]:
    """One styled figure with a single axes; title and grid pre-applied."""
    figure = plt.figure(figsize=figure_size, dpi=style.dpi)
    axis = figure.add_subplot(1, 1, 1, title=title)
    axis.grid(style.grid)
    return figure, axis


def finalize_and_show_or_save(
    figure: plt.Figure,
    output_path: Optional[str | Path] = None,
    show_interactive: bool = True,
) -> None:
    """
    Dispose of a finished figure: PNG to `output_path` when given (parent
    dirs created, tight bounding box), else an interactive window when
    requested. The figure is always closed afterwards so long report runs
    never accumulate matplotlib state.
    """
    try:
        if output_path is not None:
            target = Path(output_path)
            target.parent.mkdir(parents=True, exist_ok=True)
            figure.savefig(target, bbox_inches="tight")
        elif show_interactive:
            plt.show()
    finally:
        plt.close(figure)


def label_time_axis_seconds(axis: plt.Axes) -> None:
    axis.set_xlabel("Time (seconds)")


def label_frequency_axis_hz(axis: plt.Axes, log_scale: bool = False) -> None:
    axis.set_xlabel("Frequency (Hz)")
    if log_scale:
        axis.set_xscale("log")


def label_amplitude_axis(axis: plt.Axes, unit: str = "Amplitude") -> None:
    axis.set_ylabel(unit)


def label_decibel_axis(axis: plt.Axes) -> None:
    axis.set_ylabel("Level (dB)")


def hz_tick_formatter(x, pos=None) -> str:
    if x >= 1000.0:
        return f"{int(round(x / 1000.0))}k"
    return f"{int(round(x))}"


def hz_major_ticks(f_min_hz: float, f_max_hz: float) -> List[float]:
    ticks = [20, 50, 100, 200, 500, 1000, 2000, 5000, 10000, 20000]
    out = [float(t) for t in ticks if f_min_hz <= float(t) <= f_max_hz]
    if not out:
        out = [float(max(1.0, f_min_hz)), float(f_max_hz)]
    return out


def apply_log_hz_xaxis(axis: plt.Axes, f_min_hz: float, f_max_hz: float) -> None:
    axis.set_xscale("log")
    axis.set_xlim(f_min_hz, f_max_hz)
    axis.set_xticks(hz_major_ticks(f_min_hz, f_max_hz))
    axis.xaxis.set_major_formatter(mticker.FuncFormatter(hz_tick_formatter))
    axis.xaxis.set_minor_formatter(mticker.NullFormatter())


def apply_log_hz_yaxis(axis: plt.Axes) -> None:
    axis.set_yticks(hz_major_ticks(20, 20000))
    axis.yaxis.set_major_formatter(mticker.FuncFormatter(hz_tick_formatter))
    axis.yaxis.set_minor_formatter(mticker.NullFormatter())


def time_axis_from_sample_count(number_of_samples: int, sample_rate_hz: int) -> np.ndarray:
    return np.arange(number_of_samples, dtype=np.float32) / float(sample_rate_hz)
