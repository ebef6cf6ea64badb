"""Kernel library vs the float64 NumPy oracle (the reference's formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_analysis_tpu import oracle
from audio_analysis_tpu.ops import dbfit, diffusion, edc, fftmask, logfreq, spectral, stft, trim


SR = 48_000


def _aligned(x, trim_to_peak=True, ignore=0.0):
    xj = jnp.asarray(x, dtype=jnp.float32)
    length = jnp.asarray(np.full(x.shape[:-1], x.shape[-1], np.int32))
    return trim.align_for_analysis(xj, length, SR, trim_to_peak, ignore)


# ----------------------------------------------------------------------------
# trim
# ----------------------------------------------------------------------------


def test_align_matches_slicing(synthetic_ir):
    ir, sr, _, onset = synthetic_ir
    x = ir[0]
    a = _aligned(x[None, :])
    start = int(a.start_index[0])
    assert start == int(np.argmax(np.abs(x))) == onset
    seg = np.asarray(a.samples[0])
    expected = x[start:]
    np.testing.assert_allclose(seg[: expected.size], expected, atol=0)
    assert int(a.length[0]) == expected.size
    assert np.all(seg[expected.size:] == 0.0)


def test_align_ignore_and_duration():
    x = np.zeros(1000, np.float32)
    x[100] = 1.0
    x[101:] = 0.5
    xj = jnp.asarray(x[None, :])
    a = trim.align_for_analysis(
        xj, jnp.asarray([1000], jnp.int32), 1000, True, 0.05, analysis_duration_seconds=0.2
    )
    # peak at 100, ignore 50 samples, keep 200
    assert int(a.start_index[0]) == 150
    assert int(a.length[0]) == 200


# ----------------------------------------------------------------------------
# EDC + fits
# ----------------------------------------------------------------------------


def test_edc_matches_oracle(synthetic_ir):
    ir, sr, rt60, _ = synthetic_ir
    x = ir[0]
    t_o, edc_o, start_o = oracle.schroeder_edc_db(x, sr)

    a = _aligned(x[None, :])
    r = edc.schroeder_edc_db(a.samples, a.length)
    got = np.asarray(r.edc_db[0])[: edc_o.size]

    assert int(a.start_index[0]) == start_o
    # f32 flip-cumsum vs f64: tight agreement over the usable range
    usable = edc_o > -90.0
    np.testing.assert_allclose(got[usable], edc_o[usable], atol=0.02)


def test_edc_smoothing_matches_convolve():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) * np.exp(-np.arange(4096) / 800)).astype(np.float32)
    _, edc_o, _ = oracle.schroeder_edc_db(x, SR, trim_to_peak=False, smoothing_window_samples=33)
    a = _aligned(x[None, :], trim_to_peak=False)
    r = edc.schroeder_edc_db(a.samples, a.length, smoothing_window_samples=33)
    np.testing.assert_allclose(np.asarray(r.edc_db[0]), edc_o, atol=0.05)


def test_crossing_matches_oracle(synthetic_ir):
    ir, sr, _, _ = synthetic_ir
    x = ir[1]
    t_o, edc_o, _ = oracle.schroeder_edc_db(x, sr)
    a = _aligned(x[None, :])
    r = edc.schroeder_edc_db(a.samples, a.length)

    for target in (0.0, -5.0, -10.0, -25.0, -35.0):
        c = dbfit.crossing_time(r.edc_db, r.length, target, sr)
        expected = oracle.crossing_time(t_o, edc_o, target)
        if expected is None:
            assert not bool(c.found[0])
        else:
            assert bool(c.found[0])
            assert abs(float(c.time_seconds[0]) - expected) < 2.0 / sr + 1e-5


def test_fit_matches_oracle_and_recovers_rt60(synthetic_ir):
    ir, sr, rt60_true, _ = synthetic_ir
    for ch in range(2):
        x = ir[ch]
        t_o, edc_o, _ = oracle.schroeder_edc_db(x, sr)
        a = _aligned(x[None, :])
        r = edc.schroeder_edc_db(a.samples, a.length)

        for rng_db in ((-5.0, -25.0), (-5.0, -35.0), (0.0, -10.0)):
            fit = dbfit.fit_decay_slope_over_db_range(r.edc_db, r.length, rng_db, -80.0, sr)
            expected = oracle.fit_decay_slope(t_o, edc_o, rng_db, -80.0)
            assert expected is not None and bool(fit.ok[0])
            slope_o, intercept_o, r2_o, rt60_o = expected
            assert abs(float(fit.slope_db_per_second[0]) - slope_o) / abs(slope_o) < 2e-3
            assert abs(float(fit.rt60_seconds[0]) - rt60_o) / rt60_o < 2e-3
            assert abs(float(fit.r_squared[0]) - r2_o) < 5e-3
            # and the synthetic ground truth is recovered
            assert abs(float(fit.rt60_seconds[0]) - rt60_true) / rt60_true < 0.05


def test_fit_rejects_rising_curve():
    n = 4096
    curve = jnp.asarray(np.linspace(-40.0, 0.0, n, dtype=np.float32)[None, :])
    fit = dbfit.fit_decay_slope_over_db_range(
        curve, jnp.asarray([n], jnp.int32), (-5.0, -25.0), -80.0, SR
    )
    assert not bool(fit.ok[0])


def test_batched_fit_vectorises_over_bands():
    """(B, bands, N) all at once: each row an exponential with its own RT60."""
    rt60s = np.array([[0.3, 0.6], [1.0, 1.5]])
    n = 1 << 17  # long enough that every curve crosses -35 dB
    t = np.arange(n) / SR
    curves = -60.0 * t[None, None, :] / rt60s[..., None]
    fit = dbfit.fit_decay_slope_over_db_range(
        jnp.asarray(curves, jnp.float32),
        jnp.asarray(np.full((2, 2), n), jnp.int32),
        (-5.0, -35.0),
        -80.0,
        SR,
    )
    assert fit.rt60_seconds.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(fit.rt60_seconds), rt60s, rtol=1e-3)
    assert bool(np.all(np.asarray(fit.ok)))


# ----------------------------------------------------------------------------
# STFT
# ----------------------------------------------------------------------------


def test_stft_matches_oracle():
    rng = np.random.default_rng(1)
    n, n_fft, hop = 16384, 1024, 256
    x = rng.standard_normal(n).astype(np.float32)
    t_o, f_o, mag_o = oracle.stft_magnitude_db(x, SR, n_fft, hop)

    r = stft.stft_mag_db(jnp.asarray(x[None, :]), jnp.asarray([n], jnp.int32), n_fft, hop)
    got = np.asarray(r.mag_db[0]).T  # (F, T)
    assert got.shape == mag_o.shape
    assert int(r.num_frames[0]) == mag_o.shape[1]
    np.testing.assert_allclose(got, mag_o, atol=5e-3)
    np.testing.assert_allclose(stft.frame_times_seconds(got.shape[1], hop, SR), t_o, atol=1e-6)
    np.testing.assert_allclose(stft.rfft_freqs_hz(n_fft, SR), f_o, atol=1e-3)


def test_stft_partial_validity():
    """Frames past the valid length must be floored and uncounted."""
    n, n_fft, hop = 8192, 1024, 256
    x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    valid_len = 4096
    x[valid_len:] = 0.0
    r = stft.stft_mag_db(jnp.asarray(x[None, :]), jnp.asarray([valid_len], jnp.int32), n_fft, hop)
    expected_frames = 1 + (valid_len - n_fft) // hop
    assert int(r.num_frames[0]) == expected_frames
    got = np.asarray(r.mag_db[0])
    assert np.all(got[expected_frames:] == -120.0)


# ----------------------------------------------------------------------------
# FFT masks / filterbank
# ----------------------------------------------------------------------------


def test_masks_match_oracle():
    n = 16384
    freqs = np.fft.rfftfreq(n, 1.0 / SR)
    nyq = SR / 2
    np.testing.assert_allclose(
        fftmask.make_lowpass_mask(freqs, 250.0, 1 / 6, nyq),
        oracle.lowpass_mask(freqs, 250.0, 1 / 6, nyq),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        fftmask.make_highpass_mask(freqs, 4000.0, 1 / 6, nyq),
        oracle.highpass_mask(freqs, 4000.0, 1 / 6, nyq),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        fftmask.make_bandpass_mask(freqs, 500.0, 2000.0, 1 / 6, nyq),
        oracle.bandpass_mask(freqs, 500.0, 2000.0, 1 / 6, nyq),
        atol=1e-12,
    )


def test_batched_band_filtering_matches_oracle():
    n = 8192
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    bands = fftmask.build_three_band_definitions(SR)
    masks = fftmask.build_band_mask_matrix(bands, n, SR, 1 / 6)

    out = np.asarray(fftmask.apply_band_masks(jnp.asarray(x[None, :]), jnp.asarray(masks)))[0]
    assert out.shape == (3, n)
    for b in range(3):
        expected = oracle.apply_fft_mask(x, masks[b].astype(np.float64))
        np.testing.assert_allclose(out[b], expected, atol=2e-5)


def test_stereo_packed_band_filtering_matches_oracle():
    """The L + iR c2c packing (apply_band_masks stereo fast path) must match
    the per-channel oracle filter for BOTH channels."""
    n = 8192
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, n)).astype(np.float32)
    bands = fftmask.build_three_band_definitions(SR)
    masks = fftmask.build_band_mask_matrix(bands, n, SR, 1 / 6)

    out = np.asarray(fftmask.apply_band_masks(jnp.asarray(x), jnp.asarray(masks)))
    assert out.shape == (2, 3, n)
    for c in range(2):
        for b in range(3):
            expected = oracle.apply_fft_mask(x[c], masks[b].astype(np.float64))
            np.testing.assert_allclose(out[c, b], expected, atol=2e-5)


def test_fractional_octave_band_layout():
    bands = fftmask.build_fractional_octave_band_definitions(SR, 1)
    names = [b.name for b in bands]
    assert "1000Hz" in names  # anchored at 1 kHz
    centres = [b.centre_hz for b in bands]
    ratios = np.diff(np.log2(centres))
    np.testing.assert_allclose(ratios, 1.0, atol=1e-6)
    assert centres[0] >= 31.4 and centres[-1] <= 16000.1

    third = fftmask.build_fractional_octave_band_definitions(SR, 3)
    ratios3 = np.diff(np.log2([b.centre_hz for b in third]))
    np.testing.assert_allclose(ratios3, 1.0 / 3.0, atol=1e-6)


# ----------------------------------------------------------------------------
# spectral
# ----------------------------------------------------------------------------


def test_segment_spectrum_diagnostics():
    """A windowed sine at 1 kHz: peak ~1 kHz, centroid near it, @1kHz max."""
    n = 1 << 14
    f0 = 1000.0
    x = np.sin(2 * np.pi * f0 * np.arange(n) / SR).astype(np.float32)
    r = spectral.segment_spectrum(
        jnp.asarray(x[None, :]), jnp.asarray([n], jnp.int32), SR, use_hann_window=True
    )
    assert abs(float(r.peak_frequency_hz[0]) - f0) < SR / n + 1e-6
    assert abs(float(r.spectral_centroid_hz[0]) - f0) < 50.0


def test_segment_spectrum_matches_oracle_full_length():
    """With length == buffer (no padding), must match np.rfft of hann*x."""
    n = 4096
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n).astype(np.float32)
    r = spectral.segment_spectrum(jnp.asarray(x[None, :]), jnp.asarray([n], jnp.int32), SR)
    expected = np.abs(np.fft.rfft(x.astype(np.float64) * np.hanning(n)))
    expected_db = 20 * np.log10(np.maximum(expected, 10 ** (-120 / 20)))
    np.testing.assert_allclose(np.asarray(r.mag_db[0]), expected_db, atol=2e-2)

    phase = np.unwrap(np.angle(np.fft.rfft(x.astype(np.float64) * np.hanning(n))))
    got_phase = np.asarray(r.phase[0])
    np.testing.assert_allclose(got_phase, phase, atol=2e-3)


def test_group_delay_pure_delay():
    """A shifted impulse has constant group delay == the shift."""
    n = 4096
    delay = 100
    x = np.zeros(n, np.float32)
    x[delay] = 1.0
    r = spectral.group_delay(
        jnp.asarray(x[None, :]), jnp.asarray([n], jnp.int32), SR,
        use_hann_window=False, f_min_hz=20.0, f_max_hz=20000.0,
    )
    assert abs(float(r.median[0]) - delay) < 0.5
    assert abs(float(r.p90[0]) - delay) < 1.0


def test_deconvolve_matches_oracle():
    from audio_analysis_tpu.signals import generate_log_sine_sweep

    # near-full-band sweep: a band-limited sweep cannot recover out-of-band
    # delta energy (inherent to the method, not an implementation artefact)
    sweep = generate_log_sine_sweep(SR, 0.5, 2.0, 23999.0, post_silence_seconds=0.1).samples
    rng = np.random.default_rng(5)
    h_true = np.zeros(2000, np.float32)
    h_true[10] = 1.0
    h_true[500] = -0.3
    recorded = np.convolve(sweep, h_true)[: sweep.size].astype(np.float32)

    rec2 = recorded[:, None]
    expected = oracle.deconvolve(rec2, sweep)

    n_fft = 1 << int(max(rec2.shape[0], sweep.size) - 1).bit_length()
    got = np.asarray(
        spectral.deconvolve_spectral(
            jnp.asarray(rec2.T[None, :, :]), jnp.asarray(sweep), n_fft
        )
    )[0, 0, : rec2.shape[0]]
    np.testing.assert_allclose(got, expected[:, 0], atol=5e-4)
    # IR recovered
    assert abs(got[10] - 1.0) < 0.02 and abs(got[500] + 0.3) < 0.02


def test_ar_normal_equations_match_oracle():
    """AR(8) on an actual AR process: Gram/moment and solved coefficients."""
    rng = np.random.default_rng(6)
    n = 20000
    true_a = np.array([1.0, -1.2, 0.5])  # stable AR(2)
    e = rng.standard_normal(n) * 0.01
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = -true_a[1] * x[i - 1] - true_a[2] * x[i - 2] + e[i]
    x = x.astype(np.float32)

    p = 8
    r = spectral.ar_normal_equations(jnp.asarray(x[None, :]), jnp.asarray([n], jnp.int32), p,
                                     chunk=4096)
    a_got = spectral.solve_ar_coefficients(np.asarray(r.gram[0]), np.asarray(r.moment[0]))
    a_oracle = oracle.fit_ar_least_squares(x, p)
    np.testing.assert_allclose(a_got[:3], a_oracle[:3], atol=2e-3)
    np.testing.assert_allclose(a_got[:3], true_a, atol=0.05)

    poles = spectral.ar_poles(a_got)
    # full pole set unless trailing near-zero coefficients were trimmed
    # (an AR(3) process fitted at order 8 keeps non-negligible tail terms)
    assert 1 <= poles.size <= p
    assert poles.size >= 3  # at least the true AR(3) dynamics
    assert np.max(np.abs(poles)) < 1.0  # stable process -> stable poles


def test_ar_solve_is_stable_when_gram_is_ill_conditioned():
    """
    rcond regression: an over-ordered fit of a few pure decaying modes
    makes the Gram's condition number ~1e8, so the device-f32 Gram's
    ~1e-7 entry noise dominates the smallest singular directions. A solve
    that trusts those directions (rcond=None / machine eps) turns them
    into spurious poles OUTSIDE the unit circle; truncating at the data's
    f32 precision must recover a stable pole set close to the float64
    design-matrix answer (found via the live reference-parity matrix,
    tests/parity_matrix.py "damped" input).
    """
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    import parity_matrix

    ir = parity_matrix.make_damped_ir()
    seg = ir[parity_matrix.DAMPED_ONSET :, 0].astype(np.float64)
    seg = (seg / np.max(np.abs(seg))).astype(np.float32)

    p = 16
    r = spectral.ar_normal_equations(
        jnp.asarray(seg[None, :]), jnp.asarray([seg.size], jnp.int32), p
    )
    gram, moment = np.asarray(r.gram[0]), np.asarray(r.moment[0])
    assert np.linalg.cond(gram.astype(np.float64)) > 1e6  # the premise

    a = spectral.solve_ar_coefficients(gram, moment)
    radii = np.abs(spectral.ar_poles(a))
    assert np.all(radii < 1.0), f"unstable poles from f32 Gram noise: {radii.max()}"

    # and the dominant dynamics agree with the f64 oracle fit
    a64 = oracle.fit_ar_least_squares(seg.astype(np.float64), p)
    radii64 = np.abs(spectral.ar_poles(a64))
    assert abs(radii.max() - radii64.max()) < 0.02
    assert abs(np.median(radii) - np.median(radii64)) < 0.05


# ----------------------------------------------------------------------------
# diffusion
# ----------------------------------------------------------------------------


def test_diffusion_metrics_match_oracle():
    rng = np.random.default_rng(7)
    n = 24000
    x = (rng.standard_normal(n) * np.exp(-np.arange(n) / 8000)).astype(np.float32)
    win, hop, max_lag = 2400, 480, 480

    r = diffusion.diffusion_metrics(
        jnp.asarray(x[None, :]), jnp.asarray([n], jnp.int32), win, hop, max_lag, SR
    )
    t_frames = 1 + (n - win) // hop
    assert int(r.num_frames[0]) == t_frames

    for i in (0, t_frames // 2, t_frames - 1):
        w = x[i * hop : i * hop + win]
        ac_o = oracle.windowed_max_abs_autocorr(w, max_lag)
        ed_o = oracle.windowed_echo_density(w, 1.0, True)
        assert abs(float(r.max_abs_autocorr[0, i]) - ac_o) < 1e-3
        assert abs(float(r.echo_density[0, i]) - ed_o) < 1e-3


def test_stereo_diffusion_matches_oracle():
    rng = np.random.default_rng(8)
    n = 12000
    shared = rng.standard_normal(n)
    l = (shared + 0.5 * rng.standard_normal(n)).astype(np.float32)
    rch = (shared + 0.5 * rng.standard_normal(n)).astype(np.float32)
    win, hop, max_lag = 2400, 480, 240

    r = diffusion.stereo_diffusion_metrics(
        jnp.asarray(l[None, :]), jnp.asarray(rch[None, :]), jnp.asarray([n], jnp.int32),
        win, hop, max_lag,
    )
    t_frames = 1 + (n - win) // hop
    for i in (0, t_frames - 1):
        wl, wr = l[i * hop : i * hop + win], rch[i * hop : i * hop + win]
        assert abs(float(r.corr0[0, i]) - oracle.windowed_corr0(wl, wr)) < 1e-3
        assert abs(float(r.iacc_max[0, i]) - oracle.windowed_iacc_max(wl, wr, max_lag)) < 1e-3


# ----------------------------------------------------------------------------
# logfreq
# ----------------------------------------------------------------------------


def test_log_smoothing_reduces_variance_preserves_mean():
    n_fft = 4096
    freqs = np.fft.rfftfreq(n_fft, 1.0 / SR)
    rng = np.random.default_rng(9)
    mag = (rng.standard_normal(freqs.size) * 5.0).astype(np.float32)

    out = np.asarray(
        logfreq.smooth_mag_db_log_frequency(freqs, jnp.asarray(mag[None, :]), 20.0, 20000.0, 15, 96)
    )[0]
    sel = (freqs >= 100) & (freqs <= 10000)
    assert np.std(out[sel]) < 0.7 * np.std(mag[sel])
    # outside the range untouched
    outside = freqs < 20.0
    np.testing.assert_array_equal(out[outside], mag[outside])


def test_log_bin_aggregation_matches_direct_mean():
    n_fft = 2048
    freqs = np.fft.rfftfreq(n_fft, 1.0 / SR)
    edges = logfreq.build_log_bin_edges(20.0, 20000.0, 24, 24)
    centres, a, nonempty = logfreq.build_log_bin_matrix(freqs, edges)

    rng = np.random.default_rng(10)
    mag_db = (rng.standard_normal((freqs.size, 7)) * 10 - 40).astype(np.float32)

    got = np.asarray(
        logfreq.aggregate_db_to_log_bins(jnp.asarray(mag_db.T[None, :, :]), jnp.asarray(a))
    )[0]
    assert got.shape == (centres.size, 7)

    mag_lin = 10 ** (mag_db / 20.0)
    for b in np.nonzero(nonempty)[0][:10]:
        sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
        expected = 20 * np.log10(np.maximum(mag_lin[sel].mean(axis=0), 1e-30))
        np.testing.assert_allclose(got[b], expected, atol=0.05)  # f32 matmul vs f64
