"""
The report suite computes each STFT exactly once per file (SURVEY §3.2's
named rebuild win): spectrogram + waterfall share one 4096-STFT over BOTH
channels in one batched call, modal cloud adds exactly one 8192-STFT.
The reference computes it 3x per channel (spectrogram.py:146-155,
waterfall.py:220-227, modalcloud.py:149-155) and re-reads the WAV ~10x.

Also checks the channel-batched analyse paths agree with the per-channel
parity APIs.
"""

import numpy as np
import pytest

import audio_analysis_tpu.ops.stft as stft_ops
from audio_analysis_tpu.io.wav import write_wav_pcm16


@pytest.fixture(scope="module")
def stereo_ir_wav(tmp_path_factory):
    sr = 48_000
    n = 1 << 16
    t = np.arange(n) / sr
    rng = np.random.default_rng(11)
    env = 10.0 ** (-3.0 * t / 0.4)
    x = np.zeros((n, 2), np.float32)
    x[64:, :] = (0.05 * rng.standard_normal((n - 64, 2)) * env[: n - 64, None]).astype(np.float32)
    x[64, :] = 0.9
    path = tmp_path_factory.mktemp("sharedstft") / "ir.wav"
    write_wav_pcm16(path, x, sr)
    return path


def test_report_invokes_each_stft_exactly_once(stereo_ir_wav, tmp_path, monkeypatch):
    from audio_analysis_tpu.report.report import run_report_from_wav_file

    calls = []
    orig = stft_ops.stft_mag_db

    def counted(x, length, n_fft, hop, *args, **kwargs):
        calls.append((int(n_fft), int(x.shape[0])))
        return orig(x, length, n_fft, hop, *args, **kwargs)

    monkeypatch.setattr(stft_ops, "stft_mag_db", counted)

    result = run_report_from_wav_file(stereo_ir_wav, tmp_path / "r")

    # one batched (both channels) call per n_fft for the whole report
    assert sorted(calls) == [(4096, 2), (8192, 2)], calls
    assert result.summary_markdown_path.exists()
    for section in ("## Spectrogram", "## Waterfall", "## Modal cloud"):
        assert section in result.summary_markdown


def test_batched_channels_match_per_channel_api(stereo_ir_wav):
    from audio_analysis_tpu.analyses.decay import (
        DecayAnalysisSettings,
        analyse_decay_for_channel,
        analyse_decay_from_wav_file,
    )
    from audio_analysis_tpu.analyses.spectrogram import (
        SpectrogramAnalysisSettings,
        analyse_spectrogram_for_channel,
        analyse_spectrogram_from_wav_file,
    )
    from audio_analysis_tpu.io import get_analysis_channels, load_wav_file

    loaded = load_wav_file(stereo_ir_wav, expected_channel_mode="mono_or_stereo",
                           allow_mono_and_upmix_to_stereo=False)
    channels = get_analysis_channels(loaded, use_mono_downmix_for_stereo=False)

    batched = analyse_decay_from_wav_file(stereo_ir_wav, DecayAnalysisSettings())
    for (name, samples), b in zip(channels, batched):
        single = analyse_decay_for_channel(samples, loaded.sample_rate_hz, name,
                                           DecayAnalysisSettings())
        assert single.channel_name == b.channel_name
        assert single.analysis_start_sample_index == b.analysis_start_sample_index
        for fit_name, fit in single.fits.items():
            assert fit.rt60_seconds == pytest.approx(b.fits[fit_name].rt60_seconds, rel=1e-5)

    batched_s = analyse_spectrogram_from_wav_file(stereo_ir_wav, SpectrogramAnalysisSettings())
    for (name, samples), b in zip(channels, batched_s):
        single = analyse_spectrogram_for_channel(
            samples, loaded.sample_rate_hz, name, SpectrogramAnalysisSettings()
        )
        assert single.magnitude_db.shape == b.magnitude_db.shape
        np.testing.assert_allclose(single.magnitude_db, b.magnitude_db, atol=2e-3)
