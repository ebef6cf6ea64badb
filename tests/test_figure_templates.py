"""
Live figure templates (plot.save_via_template): the render path reuses one
live figure per kind and re-applies only data-dependent artists. Every
templated kind must produce PNGs BYTE-identical to the fresh-figure path —
these tests are the drift guard between each plot_*_figure and its
_update_*_figure counterpart.

Results are synthesized host-side (no device work).
"""

import numpy as np
import pytest

import audio_analysis_tpu.plot as P
from audio_analysis_tpu.analyses import spectrogram as S


@pytest.fixture(autouse=True)
def fresh_template_state():
    old = P.FIGURE_TEMPLATES_ENABLED
    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    P.clear_tight_bbox_cache()
    yield
    P.FIGURE_TEMPLATES_ENABLED = old
    P.clear_figure_templates()
    P.clear_tight_bbox_cache()


def _spectrogram_result(seed: int, frames: int, name: str) -> S.ChannelSpectrogramResult:
    rng = np.random.default_rng(seed)
    n_fft, hop, sr = 4096, 512, 48_000
    n_bins = n_fft // 2 + 1
    mag = rng.uniform(-120.0, 0.0, (n_bins, frames)).astype(np.float32)
    return S.ChannelSpectrogramResult(
        channel_name=name,
        sample_rate_hz=sr,
        analysis_start_sample_index=0,
        analysis_length_samples=frames * hop,
        time_seconds=(np.arange(frames) * hop / sr).astype(np.float32),
        frequency_hz=np.linspace(0.0, sr / 2, n_bins).astype(np.float32),
        magnitude_db=mag,
    )


def _render_spectrogram(tmp_path, tag, results, title_source="tap.wav"):
    base = tmp_path / f"{tag}"
    S.render_spectrogram_plots(
        results,
        S.SpectrogramAnalysisSettings(),
        S.SpectrogramPlotSettings(),
        base,
        False,
        title_source,
    )
    return [
        (tmp_path / f"{tag}_spectrogram_{r.channel_name}.png").read_bytes()
        for r in results
    ]


def test_spectrogram_template_byte_identical(tmp_path):
    # two taps with different data, durations and titles
    a = [_spectrogram_result(0, 180, "left"), _spectrogram_result(1, 180, "right")]
    b = [_spectrogram_result(2, 150, "left"), _spectrogram_result(3, 150, "right")]

    P.FIGURE_TEMPLATES_ENABLED = False
    ref_a = _render_spectrogram(tmp_path, "fresh_a", a, title_source="tapA.wav")
    ref_b = _render_spectrogram(tmp_path, "fresh_b", b, title_source="tapB.wav")

    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    # build, then update with new shape/title, then update back
    got_a = _render_spectrogram(tmp_path, "tpl_a", a, title_source="tapA.wav")
    got_b = _render_spectrogram(tmp_path, "tpl_b", b, title_source="tapB.wav")
    got_a2 = _render_spectrogram(tmp_path, "tpl_a2", a, title_source="tapA.wav")
    assert len(P._FIGURE_TEMPLATES) == 1
    assert got_a == ref_a
    assert got_b == ref_b
    assert got_a2 == ref_a


def test_template_falls_back_fresh_on_key_change(tmp_path):
    a = [_spectrogram_result(0, 64, "left")]
    P.FIGURE_TEMPLATES_ENABLED = False
    ref = _render_spectrogram(tmp_path, "fresh", a)

    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    _render_spectrogram(tmp_path, "warm", a)
    # a different settings object changes the key -> rebuild, still correct
    base = tmp_path / "other"
    S.render_spectrogram_plots(
        a,
        S.SpectrogramAnalysisSettings(f_max_hz=10_000.0),
        S.SpectrogramPlotSettings(),
        base,
        False,
        "warm.wav",
    )
    assert (tmp_path / "other_spectrogram_left.png").exists()
    got = _render_spectrogram(tmp_path, "fresh", a)  # same name: overwrite
    assert got == ref


def _loaded_audio(seed: int, n: int, name: str):
    from audio_analysis_tpu.io import LoadedAudio

    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48_000.0
    env = 10.0 ** (-3.0 * t / 0.5)
    samples = (0.1 * rng.standard_normal((n, 2)) * env[:, None]).astype(np.float32)
    samples[64, :] = 0.9
    return LoadedAudio(
        samples=samples, sample_rate_hz=48_000, file_path=__import__("pathlib").Path(name)
    )


def test_ir_templates_byte_identical(tmp_path):
    from audio_analysis_tpu.analyses import impulse_response as IR

    s = IR.ImpulseResponseViewSettings()
    a = _loaded_audio(0, 48_000, "tapA.wav")
    b = _loaded_audio(1, 40_000, "tapB.wav")

    def render(tag, loaded):
        IR.plot_impulse_response_waveform(loaded, s, tmp_path / f"{tag}.png", False)
        IR.plot_impulse_response_log_magnitude(
            loaded, s, tmp_path / f"{tag}_tail.png", False
        )
        return [
            (tmp_path / f"{tag}{sfx}.png").read_bytes()
            for sfx in ("", "_early", "_tail")
        ]

    P.FIGURE_TEMPLATES_ENABLED = False
    ref_a = render("fresh_a", a)
    ref_b = render("fresh_b", b)

    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    got_a = render("tpl_a", a)
    got_b = render("tpl_b", b)
    got_a2 = render("tpl_a2", a)
    assert got_a == ref_a
    assert got_b == ref_b
    assert got_a2 == ref_a


def test_fr_template_byte_identical(tmp_path):
    from audio_analysis_tpu.analyses import frequency_response as F

    def fr_results(seed, n_bins):
        rng = np.random.default_rng(seed)
        out = []
        for name in ("left", "right"):
            f = np.linspace(0.0, 24_000.0, n_bins).astype(np.float32)
            m = rng.uniform(-80.0, 0.0, n_bins).astype(np.float32)
            out.append(
                F.ChannelFrequencyResponse(
                    channel_name=name,
                    sample_rate_hz=48_000,
                    analysis_start_sample_index=0,
                    analysis_length_samples=2 * (n_bins - 1),
                    frequency_hz=f,
                    magnitude_db=m,
                    peak_frequency_hz=float(f[int(np.argmax(m))]),
                    spectral_centroid_hz=float(rng.uniform(500, 5000)),
                )
            )
        return out

    a, b = fr_results(0, 30_000), fr_results(1, 20_000)
    s, p = F.FrequencyResponseAnalysisSettings(), F.FrequencyResponsePlotSettings()

    def render(tag, results, title_source):
        F.render_frequency_response_plots(
            results, s, p, tmp_path / tag, False, title_source
        )
        return (tmp_path / f"{tag}_fr.png").read_bytes()

    P.FIGURE_TEMPLATES_ENABLED = False
    ref_a = render("fresh_a", a, "tapA.wav")
    ref_b = render("fresh_b", b, "tapB.wav")

    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    got_a = render("tpl_a", a, "tapA.wav")
    got_b = render("tpl_b", b, "tapB.wav")  # per-tap legend labels change
    got_a2 = render("tpl_a2", a, "tapA.wav")
    assert got_a == ref_a
    assert got_b == ref_b
    assert got_a2 == ref_a


def test_gd_decay_diffusion_modal_templates_byte_identical(tmp_path):
    from audio_analysis_tpu.analyses import decay as D
    from audio_analysis_tpu.analyses import diffusion as DF
    from audio_analysis_tpu.analyses import group_delay as G
    from audio_analysis_tpu.analyses import modalcloud as M

    def gd_results(seed, n):
        rng = np.random.default_rng(seed)
        f = np.linspace(20.0, 20_000.0, n)
        return [
            G.ChannelGroupDelayResult(name, 48_000, f, rng.normal(0, 50, n))
            for name in ("left", "right")
        ]

    def decay_results(seed, n):
        rng = np.random.default_rng(seed)
        out = []
        for name in ("left", "right"):
            t = (np.arange(n) / 48_000.0).astype(np.float32)
            edc = (-60.0 * t / 0.5 + rng.normal(0, 0.5, n)).astype(np.float32)
            fits = {}
            for fname, rdb in (("T20", (-5.0, -25.0)), ("T30", (-5.0, -35.0))):
                fits[fname] = D.LinearDecayFit(
                    name=fname, range_db=rdb,
                    start_time_seconds=0.05, end_time_seconds=0.3,
                    slope_db_per_second=-120.0 + 10 * rng.random(),
                    intercept_db=-3.0, r_squared=0.99,
                    rt60_seconds=0.5 + 0.1 * rng.random(),
                )
            out.append(
                D.ChannelDecayAnalysis(
                    channel_name=name, sample_rate_hz=48_000,
                    analysis_start_sample_index=0, time_seconds=t, edc_db=edc,
                    early_decay_10db_time_seconds=float(0.08 + 0.01 * rng.random()),
                    fits=fits,
                )
            )
        return out

    def diffusion_results(seed, n):
        rng = np.random.default_rng(seed)
        t = (np.arange(n) * 0.01).astype(np.float32)
        return [
            DF.DiffusionChannelResult(
                name, 48_000,
                DF.DiffusionTimeSeries(
                    time_seconds=t,
                    max_abs_autocorr=rng.uniform(0, 1, n).astype(np.float32),
                    echo_density=rng.uniform(0, 1.2, n).astype(np.float32),
                    corr0=rng.uniform(-1, 1, n).astype(np.float32) if name == "left" else None,
                    iacc_max=rng.uniform(0, 1, n).astype(np.float32) if name == "left" else None,
                ),
            )
            for name in ("left", "right")
        ]

    def modal_results(seed, npts):
        rng = np.random.default_rng(seed)
        pts = [
            M.ModalPoint(float(f), float(r), 0.95)
            for f, r in zip(
                rng.uniform(30, 18_000, npts), rng.uniform(0.1, 1.5, npts)
            )
        ]
        return [M.ChannelModalCloudResult("left", 48_000, 0, 96_000, "t30", pts)]

    ds, dp = D.DecayAnalysisSettings(), D.DecayPlotSettings()
    gp = G.GroupDelayPlotSettings()
    ms, mp = M.ModalCloudAnalysisSettings(), M.ModalCloudPlotSettings()

    def render(tag, seed, n):
        D.render_decay_plots(decay_results(seed, n), ds, dp, tmp_path / tag, False, f"t{seed}.wav")
        G.render_group_delay_plots(gd_results(seed, n // 10), gp, tmp_path / tag, False)
        DF.render_diffusion_plots(diffusion_results(seed, 200 + seed), tmp_path / tag, False, f"t{seed}.wav")
        M.render_modal_cloud_plots(modal_results(seed, 150 + seed), ms, mp, tmp_path / tag, False, f"t{seed}.wav")
        names = ["_decay", "_groupdelay_left", "_groupdelay_right", "_diffusion", "_modalcloud_left"]
        return [(tmp_path / f"{tag}{s}.png").read_bytes() for s in names]

    P.FIGURE_TEMPLATES_ENABLED = False
    refs = [render(f"fresh{i}", i, 30_000 + 1000 * i) for i in range(3)]

    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    gots = [render(f"tpl{i}", i, 30_000 + 1000 * i) for i in range(3)]
    for i, (got, ref) in enumerate(zip(gots, refs)):
        for name, g, r in zip(
            ("decay", "gd_l", "gd_r", "diffusion", "modal"), got, ref
        ):
            assert g == r, f"render {i} {name} differs between template and fresh"


def test_waterfall_3d_template_byte_identical(tmp_path):
    from audio_analysis_tpu.analyses import waterfall as W

    def wf_results(seed, n_slices):
        rng = np.random.default_rng(seed)
        n_bins = 2049
        f = np.linspace(0.0, 24_000.0, n_bins).astype(np.float32)
        times = (np.arange(n_slices) * 0.05).astype(np.float32)
        mags = rng.uniform(-90.0, 0.0, (n_slices, n_bins)).astype(np.float32)
        return [
            W.ChannelWaterfallResult("left", 48_000, 0, 96_000, times, f, mags)
        ]

    s, p = W.WaterfallAnalysisSettings(), W.WaterfallPlotSettings()

    def render(tag, seed, n_slices):
        W.render_waterfall_plots(
            wf_results(seed, n_slices), s, p, tmp_path / tag, False, f"t{seed}.wav"
        )
        return (tmp_path / f"{tag}_waterfall_left.png").read_bytes()

    P.FIGURE_TEMPLATES_ENABLED = False
    refs = [render(f"fresh{i}", i, 18 - i) for i in range(3)]

    P.FIGURE_TEMPLATES_ENABLED = True
    P.clear_figure_templates()
    gots = [render(f"tpl{i}", i, 18 - i) for i in range(3)]
    for i, (g, r) in enumerate(zip(gots, refs)):
        assert g == r, f"waterfall render {i} differs between template and fresh"
