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
