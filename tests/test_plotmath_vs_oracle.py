"""
Numeric oracle tests for the waterfall slice construction and the
spectrogram colour scale (reference waterfall.py:289-341 and
spectrogram.py:278-289) — the plot-facing math that previously only had
artifact-existence coverage.
"""

import numpy as np
import pytest

from audio_analysis_tpu import oracle
from audio_analysis_tpu.analyses.spectrogram import (
    SpectrogramAnalysisSettings,
    SpectrogramPlotSettings,
    analyse_spectrogram_for_channel,
    spectrogram_color_limits,
)
from audio_analysis_tpu.analyses.waterfall import (
    WaterfallAnalysisSettings,
    analyse_waterfall_for_channel,
    select_slice_frame_indices,
)

SR = 48_000


@pytest.fixture(scope="module")
def decaying_noise():
    n = 1 << 16
    rng = np.random.default_rng(21)
    t = np.arange(n) / SR
    env = 10.0 ** (-3.0 * t / 0.5)
    x = np.zeros(n, np.float32)
    x[100:] = (0.1 * rng.standard_normal(n - 100) * env[: n - 100]).astype(np.float32)
    x[100] = 0.8
    return x


def _oracle_stft_of_trimmed(x, n_fft, hop):
    seg = np.asarray(x, np.float64)
    seg = seg[int(np.argmax(np.abs(seg))):]
    return oracle.stft_magnitude_db(seg, SR, n_fft, hop)


@pytest.mark.parametrize("db_reference", ["global_max", "slice_max"])
def test_waterfall_slices_match_oracle(decaying_noise, db_reference):
    settings = WaterfallAnalysisSettings(db_reference=db_reference)
    result = analyse_waterfall_for_channel(decaying_noise, SR, "mono", settings)

    t_o, f_o, mag_o = _oracle_stft_of_trimmed(decaying_noise, settings.n_fft, settings.hop_length)
    frame_idx = select_slice_frame_indices(t_o.astype(np.float32), settings)

    fmask = (f_o >= max(1.0, settings.f_min_hz)) & (f_o <= settings.f_max_hz)
    slices_o = mag_o.T[frame_idx][:, fmask]  # (S, F)
    rel_o = oracle.waterfall_rel_db_slices(slices_o, db_reference, settings.dynamic_range_db)

    assert result.slice_magnitude_rel_db.shape == rel_o.shape
    np.testing.assert_allclose(
        result.slice_times_seconds, t_o[frame_idx].astype(np.float32), atol=1e-6
    )
    np.testing.assert_allclose(result.frequency_hz, f_o[fmask].astype(np.float32), atol=1e-3)
    # f32 kernel vs f64 oracle on dB values of noise-driven spectra
    np.testing.assert_allclose(result.slice_magnitude_rel_db, rel_o, atol=0.05)


def test_spectrogram_scale_matches_oracle(decaying_noise):
    analysis_settings = SpectrogramAnalysisSettings()
    plot_settings = SpectrogramPlotSettings()
    result = analyse_spectrogram_for_channel(decaying_noise, SR, "mono", analysis_settings)

    nyquist = 0.5 * SR
    fmask = (result.frequency_hz >= analysis_settings.f_min_hz) & (
        result.frequency_hz <= min(analysis_settings.f_max_hz, nyquist)
    )
    mag = result.magnitude_db[fmask, :]

    vmin, vmax = spectrogram_color_limits(mag, analysis_settings, plot_settings)
    vmin_o, vmax_o = oracle.spectrogram_color_scale(mag, analysis_settings.dynamic_range_db)
    assert vmax == pytest.approx(vmax_o, abs=1e-4)
    assert vmin == pytest.approx(vmin_o, abs=1e-4)

    # ... and against the oracle's own f64 STFT magnitudes end-to-end
    t_o, f_o, mag_o = _oracle_stft_of_trimmed(
        decaying_noise, analysis_settings.n_fft, analysis_settings.hop_length
    )
    fmask_o = (f_o >= analysis_settings.f_min_hz) & (f_o <= min(analysis_settings.f_max_hz, nyquist))
    vmin_e2e, vmax_e2e = oracle.spectrogram_color_scale(
        mag_o[fmask_o, :], analysis_settings.dynamic_range_db
    )
    assert vmax == pytest.approx(vmax_e2e, abs=0.05)
    assert vmin == pytest.approx(vmin_e2e, abs=0.05)

    # pinned limits short-circuit the percentiles
    pinned = SpectrogramPlotSettings(vmin_db=-80.0, vmax_db=-10.0)
    assert spectrogram_color_limits(mag, analysis_settings, pinned) == (-80.0, -10.0)
