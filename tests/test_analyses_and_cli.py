"""End-to-end tests: analysis modules, CLIs, report + bundle contracts."""

import re
from pathlib import Path

import numpy as np
import pytest

from audio_analysis_tpu.io import write_bundle, write_wav_pcm16


SR = 48_000


@pytest.fixture(scope="module")
def ir_wav(tmp_path_factory):
    """Synthetic stereo verb IR with known RT60 = 0.8 s, peak at sample 480."""
    n = 1 << 16
    rng = np.random.default_rng(7)
    t = np.arange(n) / SR
    env = 10.0 ** (-3.0 * t / 0.8)
    ir = np.zeros((n, 2), np.float32)
    ir[480:, 0] = (0.05 * rng.standard_normal(n - 480) * env[: n - 480]).astype(np.float32)
    ir[480:, 1] = (0.05 * rng.standard_normal(n - 480) * env[: n - 480]).astype(np.float32)
    ir[480, :] = 0.9
    path = tmp_path_factory.mktemp("ir") / "verb_ir.wav"
    write_wav_pcm16(path, ir, SR)
    return path


def test_decay_recovers_known_rt60(ir_wav):
    from audio_analysis_tpu.analyses import decay

    results = decay.analyse_decay_from_wav_file(
        ir_wav, decay.DecayAnalysisSettings(compute_edt=True)
    )
    assert [r.channel_name for r in results] == ["left", "right"]
    for r in results:
        assert r.analysis_start_sample_index == 480
        for name in ("EDT", "T20", "T30"):
            assert name in r.fits
            assert abs(r.fits[name].rt60_seconds - 0.8) / 0.8 < 0.05
            assert r.fits[name].r_squared > 0.99

    text = decay.summarise_decay_results_text(results)
    assert "[left] analysis_start_sample_index=480" in text
    assert re.search(r"T30: range=\[-5\.0,-35\.0\]dB .* rt60=0\.7\d{3}s", text)


def test_decay_summary_format_contract(ir_wav):
    """The exact reference line shapes (decay.py:502-542) are preserved."""
    from audio_analysis_tpu.analyses import decay

    results = decay.analyse_decay_from_wav_file(ir_wav)
    text = decay.summarise_decay_results_text(results)
    lines = text.splitlines()
    assert lines[0].startswith("[left] analysis_start_sample_index=")
    assert lines[1].startswith("  early_0_to_-10_time=")
    assert lines[2] == "  EDT: NA"  # compute_edt defaults to False
    assert re.match(
        r"  T20: range=\[-5\.0,-25\.0\]dB time=\[\d+\.\d{4},\d+\.\d{4}\]s "
        r"slope=-?\d+\.\d{6}dB/s r2=\d\.\d{6} rt60=\d+\.\d{4}s",
        lines[3],
    )


def test_rt60bands_frequency_dependent_decay(tmp_path):
    """Frequency-dependent decay is resolved per band.

    Content: 600-1800 Hz decaying at 0.7 s and >2500 Hz at 0.4 s. The Mid
    and High bands must recover those numbers. The Low band of a synthetic
    gated-noise signal is dominated by circular-filtering seam ringing —
    a property of the FFT-mask method itself (the reference's own golden
    shows "Low 86.019 s", verb_report.md:45) — so it only gets an ordering
    assertion.
    """
    n = 1 << 17
    pre = 4800  # 0.1 s lead-in: keeps circular filter pre-ring out of the tail
    rng = np.random.default_rng(11)
    t = np.arange(n - pre) / SR
    noise = rng.standard_normal(n - pre)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n - pre, 1 / SR)
    mid = np.fft.irfft(spec * ((freqs > 600) & (freqs < 1800)), n=n - pre)
    high = np.fft.irfft(spec * (freqs > 2500), n=n - pre)
    tail = mid * 10 ** (-3 * t / 0.7) + high * 10 ** (-3 * t / 0.4)
    x = np.concatenate([np.zeros(pre), tail])
    x /= np.abs(x).max() * 1.05
    path = tmp_path / "twoband.wav"
    write_wav_pcm16(path, np.stack([x, x], axis=1).astype(np.float32), SR)

    from audio_analysis_tpu.analyses import rt60bands

    results = rt60bands.analyse_rt60_bands_from_wav_file(path)
    metrics = results[0].band_metrics_by_name
    mid_rt = metrics["Mid"].rt60_t30_seconds
    high_rt = metrics["High"].rt60_t30_seconds
    assert abs(mid_rt - 0.7) / 0.7 < 0.15
    assert abs(high_rt - 0.4) / 0.4 < 0.15
    low_rt = metrics["Low"].rt60_t30_seconds
    assert low_rt is None or low_rt > high_rt


def test_octave_mode_band_table(ir_wav):
    from audio_analysis_tpu.analyses import rt60bands

    settings = rt60bands.Rt60BandsAnalysisSettings(band_mode="octave", include_t20=True)
    results = rt60bands.analyse_rt60_bands_from_wav_file(ir_wav, settings)
    text = rt60bands.summarise_rt60_bands_results_text(results, include_t20=True, include_edt=False)
    assert "Band  T30_RT60(s)  T20_RT60(s)" in text
    assert "1000Hz" in text


def test_deconvolve_roundtrip_recovers_rt60(tmp_path):
    """gen sweep -> convolve with known IR -> deconvolve -> decay: SURVEY §4."""
    from audio_analysis_tpu import signals as sig
    from audio_analysis_tpu.analyses import decay, deconvolve

    sweep = sig.generate_log_sine_sweep(
        SR, 2.0, 10.0, 23000.0, pre_silence_seconds=0.1, post_silence_seconds=1.0
    ).samples

    rt60_true = 0.5
    n_ir = 1 << 15
    rng = np.random.default_rng(2)
    t = np.arange(n_ir) / SR
    h = (0.1 * rng.standard_normal(n_ir) * 10 ** (-3 * t / rt60_true)).astype(np.float32)
    h[0] = 1.0

    recorded = np.convolve(sweep, h)[: sweep.size + n_ir].astype(np.float32)
    recorded /= np.abs(recorded).max() * 1.2

    sweep_path = tmp_path / "sweep.wav"
    rec_path = tmp_path / "recorded.wav"
    write_wav_pcm16(sweep_path, sweep, SR)
    write_wav_pcm16(rec_path, recorded, SR)

    ir = deconvolve.deconvolve_from_wav_files(
        rec_path, sweep_path, output_ir_wav_file_path=tmp_path / "out_ir.wav"
    )
    assert (tmp_path / "out_ir.wav").exists()

    results = decay.analyse_decay_from_wav_file(tmp_path / "out_ir.wav")
    # T20 (the shallower fit) is robust to the deconvolution noise floor in
    # the IR tail; T30 reaches deeper and picks up a few % of bias.
    rt60_est = results[0].fits["T20"].rt60_seconds
    assert abs(rt60_est - rt60_true) / rt60_true < 0.12
    assert abs(results[0].fits["T30"].rt60_seconds - rt60_true) / rt60_true < 0.25


def test_gen_cli_to_analyse_cli_pipeline(tmp_path, capsys):
    """Drive both CLIs exactly as a reference user would."""
    from audio_analysis_tpu.cli import analyse_cli, gen_cli

    gen_cli.main(["--output-dir", str(tmp_path), "karplus_pluck", "--duration_seconds", "0.7"])
    capsys.readouterr()

    analyse_cli.main(
        [
            "decay",
            "--input",
            str(tmp_path / "karplus_pluck.wav"),
            "--output",
            str(tmp_path / "kp"),
            "--no_show",
        ]
    )
    out = capsys.readouterr().out
    assert "analysis_start_sample_index=" in out
    assert (tmp_path / "kp_decay.png").exists()


def test_report_writes_full_artifact_set(ir_wav, tmp_path):
    from audio_analysis_tpu.report import ReportSettings, run_report_from_wav_file

    base = tmp_path / "rep" / "verb"
    results = run_report_from_wav_file(ir_wav, base, ReportSettings())

    for suffix in (
        "",
        "_early",
        "_tail",
        "_decay",
        "_rt60bands",
        "_fr",
        "_groupdelay_left",
        "_groupdelay_right",
        "_spectrogram_left",
        "_spectrogram_right",
        "_waterfall_left",
        "_waterfall_right",
        "_diffusion",
        "_modalcloud_left",
        "_modalcloud_right",
    ):
        assert (base.parent / f"verb{suffix}.png").exists(), suffix

    md = results.summary_markdown
    assert md.startswith("# Offline Reverb Analysis Report")
    for section in (
        "## Impulse response",
        "## Decay / EDC",
        "## RT60 by band",
        "## Frequency response",
        "## Group delay",
        "## Spectrogram",
        "## Waterfall",
        "## Diffusion / echo density proxy",
        "## Modal cloud",
    ):
        assert section in md, section
    assert (base.parent / "verb_report.md").read_text() == md

    # every image the markdown embeds must exist (the reference embeds a
    # _groupdelay.png its renderer never writes — report.py:319 vs
    # group_delay.py:201; also what --resume completeness checks)
    for name in re.findall(r"!\[[^\]]*\]\(([^)]+)\)", md):
        assert (base.parent / name).exists(), name


def test_report_mono_mode(ir_wav, tmp_path):
    from audio_analysis_tpu.report import ReportSettings, run_report_from_wav_file

    base = tmp_path / "mono" / "verb"
    run_report_from_wav_file(
        ir_wav,
        base,
        ReportSettings(
            common_use_mono_downmix_for_stereo=True,
            run_waterfall=False,
            run_modal_cloud=False,
            run_group_delay=False,
        ),
    )
    assert (base.parent / "verb_spectrogram_mono.png").exists()
    assert not (base.parent / "verb_spectrogram_left.png").exists()


def test_bundle_runner_and_failure_isolation(tmp_path):
    from audio_analysis_tpu.report import BundleRunSettings, ReportSettings, run_bundle_report

    n = 1 << 14
    rng = np.random.default_rng(5)
    t = np.arange(n) / SR
    good = np.zeros((n, 2), np.float32)
    good[10:, :] = (0.05 * rng.standard_normal((n - 10, 2)) * 10 ** (-3 * t[: n - 10, None] / 0.25))
    good[10, :] = 0.9

    root = write_bundle(tmp_path / "run", {"good": good, "bad": good}, SR)
    # corrupt one tap to exercise per-tap isolation
    (root / "taps" / "bad.wav").write_bytes(b"not a wav file")

    fast = ReportSettings(
        run_waterfall=False, run_modal_cloud=False, run_group_delay=False, run_spectrogram=False
    )
    index = run_bundle_report(root, BundleRunSettings(report_settings=fast))
    content = index.read_text()
    # index links resolve relative to the index file (the reference's
    # double-subdir links are broken in a viewer — MIGRATION.md)
    assert "- [good](good/good_report.md)" in content
    assert "bad: FAILED" in content
    assert (root / "reports" / "bad" / "error.txt").exists()
    assert (root / "reports" / "good" / "good_report.md").exists()

    # per-kind render timings land next to the index
    import json as _json

    timings = _json.loads((root / "reports" / "plot_timings.json").read_text())
    assert timings, "expected at least one render kind"
    for kind, row in timings.items():
        # render_*/plot_* figure jobs + the template-warmup job that fronts
        # the first render (report/warmup.py)
        assert kind.startswith(("render_", "plot_", "warmup_")), kind
        assert row["jobs"] >= 1 and row["seconds"] >= 0.0
    assert "warmup_figure_templates" in timings  # warmup rode the worker

    # resume skips the completed tap
    index2 = run_bundle_report(root, BundleRunSettings(report_settings=fast, resume=True))
    assert "(cached)" in index2.read_text()


def test_bundle_tap_sharding_merges_via_resume(tmp_path):
    """Shard runs render disjoint tap subsets (no index); a --resume merge
    finds every tap complete and writes the full index from cache."""
    from audio_analysis_tpu.report import BundleRunSettings, ReportSettings, run_bundle_report

    n = 1 << 14
    rng = np.random.default_rng(9)
    t = np.arange(n) / SR
    taps = {}
    for i, rt60 in enumerate([0.2, 0.25, 0.3]):
        x = np.zeros((n, 2), np.float32)
        x[10:, :] = (
            0.05 * rng.standard_normal((n - 10, 2)) * 10 ** (-3 * t[: n - 10, None] / rt60)
        )
        x[10, :] = 0.9
        taps[f"tap{i}"] = x
    root = write_bundle(tmp_path / "run", taps, SR)

    fast = ReportSettings(
        run_waterfall=False, run_modal_cloud=False, run_group_delay=False, run_spectrogram=False
    )
    shard0 = run_bundle_report(
        root, BundleRunSettings(report_settings=fast, tap_shard="0/2")
    )
    assert shard0.name == "bundle_shard_0of2.md"
    # shard 0 owns taps 0 and 2; no bundle index yet
    assert (root / "reports" / "tap0" / "tap0_report.md").exists()
    assert (root / "reports" / "tap2" / "tap2_report.md").exists()
    assert not (root / "reports" / "tap1" / "tap1_report.md").exists()
    assert not (root / "reports" / "bundle_report.md").exists()
    assert (root / "reports" / "plot_timings_shard0of2.json").exists()

    run_bundle_report(root, BundleRunSettings(report_settings=fast, tap_shard="1/2"))

    # merge: every tap is cached; the full index is written
    index = run_bundle_report(root, BundleRunSettings(report_settings=fast, resume=True))
    content = index.read_text()
    for tap in taps:
        assert f"- [{tap}]({tap}/{tap}_report.md) (cached)" in content

    import pytest as _pytest

    with _pytest.raises(ValueError, match="tap_shard"):
        run_bundle_report(root, BundleRunSettings(report_settings=fast, tap_shard="2/2"))

    # more shards than taps: the extra shard owns nothing and says so
    empty = run_bundle_report(
        root, BundleRunSettings(report_settings=fast, tap_shard="3/4")
    )
    assert empty.name == "bundle_shard_3of4.md"
    assert "shard 3/4" in empty.read_text()
    assert "](" not in empty.read_text()  # no tap entries


def test_cli_bundle_bands_decimate_wiring(tmp_path, monkeypatch, capsys):
    """--bands-decimate reaches EngineConfig on the engine fast path."""
    import audio_analysis_tpu.report as report_pkg
    from audio_analysis_tpu.cli import analyse_cli

    captured = {}

    def fake_engine_report(root, settings):
        captured["config"] = settings.config
        return Path(root) / "reports" / "index.md"

    monkeypatch.setattr(report_pkg, "run_bundle_report_engine", fake_engine_report)
    analyse_cli.main(
        [
            "bundle",
            "--input", str(tmp_path),
            "--no-plots",
            "--bands-decimate",
            "--bands", "octave",
        ]
    )
    assert captured["config"].bands_decimate is True
    assert captured["config"].band_mode == "octave"
    capsys.readouterr()


def test_cli_bundle_engine_kernel_flags_tristate(tmp_path, monkeypatch, capsys):
    """--no-bands-decimate / --[no-]modal-trim-bins reach EngineConfig; absent
    flags keep the EngineConfig defaults (the escape hatches for the measured
    default flips — ADVICE r3)."""
    from dataclasses import fields

    import audio_analysis_tpu.report as report_pkg
    from audio_analysis_tpu.cli import analyse_cli
    from audio_analysis_tpu.engine import EngineConfig

    captured = {}

    def fake_engine_report(root, settings):
        captured["config"] = settings.config
        return Path(root) / "reports" / "index.md"

    monkeypatch.setattr(report_pkg, "run_bundle_report_engine", fake_engine_report)

    analyse_cli.main(
        ["bundle", "--input", str(tmp_path), "--no-plots",
         "--no-bands-decimate", "--no-modal-trim-bins"]
    )
    assert captured["config"].bands_decimate is False
    assert captured["config"].modal_trim_bins is False

    analyse_cli.main(
        ["bundle", "--input", str(tmp_path), "--no-plots", "--modal-trim-bins"]
    )
    assert captured["config"].modal_trim_bins is True
    # no flag given -> the dataclass defaults survive untouched
    defaults = {f.name: f.default for f in fields(EngineConfig)}
    assert captured["config"].bands_decimate == defaults["bands_decimate"]
    capsys.readouterr()


def test_cli_watch_engine_kernel_flags(tmp_path, monkeypatch, capsys):
    """The watch subcommand forwards the engine kernel flags too."""
    import audio_analysis_tpu.report as report_pkg
    from audio_analysis_tpu.cli import analyse_cli

    captured = {}

    def fake_watch(root, settings):
        captured["settings"] = settings

    monkeypatch.setattr(report_pkg, "watch_bundle_runs", fake_watch)
    analyse_cli.main(
        ["watch", "--input", str(tmp_path), "--no-bands-decimate",
         "--no-modal-trim-bins", "--bands", "third"]
    )
    config = captured["settings"].engine.config
    assert config.bands_decimate is False
    assert config.modal_trim_bins is False
    assert config.band_mode == "third"
    capsys.readouterr()


def test_cli_batch_loose_wav_files(tmp_path, capsys):
    """`analyse batch --inputs ...` materialises a bundle view from loose
    WAV files (symlinked taps, input order, deduped stems) and runs the
    fused-engine pipeline over it."""
    import json

    import numpy as np

    from audio_analysis_tpu.cli import analyse_cli
    from audio_analysis_tpu.io.wav import write_wav_pcm16

    sr, n = 48_000, 1 << 14
    t = np.arange(n) / sr
    rng = np.random.default_rng(5)

    def ir(rt60, channels):
        x = np.zeros((n, channels), np.float32)
        x[16:, :] = (
            0.05 * rng.standard_normal((n - 16, channels))
            * 10.0 ** (-3.0 * t[: n - 16, None] / rt60)
        ).astype(np.float32)
        x[16, :] = 0.9
        return x

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    w1 = tmp_path / "a" / "verb.wav"
    w2 = tmp_path / "b" / "verb.wav"  # duplicate stem -> verb_2
    w3 = tmp_path / "mono_ir.wav"  # mono input -> upmixed by the loaders
    write_wav_pcm16(w1, ir(0.25, 2), sr)
    write_wav_pcm16(w2, ir(0.4, 2), sr)
    write_wav_pcm16(w3, ir(0.3, 1), sr)

    out = tmp_path / "batch_out"
    analyse_cli.main(
        ["batch", "--inputs", str(w1), str(w2), str(w3),
         "--output", str(out), "--no-plots"]
    )
    capsys.readouterr()

    meta = json.loads((out / "meta.json").read_text())
    assert meta["taps"] == ["verb", "verb_2", "mono_ir"]  # input order, deduped
    assert (out / "taps" / "verb.wav").is_symlink()

    metrics = json.loads((out / "reports" / "bundle_metrics.json").read_text())
    t30 = np.asarray(metrics["metrics"]["t30_rt60"], np.float64)
    ok = np.asarray(metrics["metrics"]["t30_ok"], bool)
    assert t30.shape[0] == 3 and ok.all()
    # per-file decays recovered in input order
    assert abs(t30[0].mean() - 0.25) < 0.05
    assert abs(t30[1].mean() - 0.4) < 0.08
    assert abs(t30[2].mean() - 0.3) < 0.06
    assert (out / "reports" / "verb_2" / "verb_2_report.md").exists()

    # mixed sample rates are rejected up front
    import pytest as _pytest

    w4 = tmp_path / "other_rate.wav"
    write_wav_pcm16(w4, ir(0.3, 2), 44_100)
    from audio_analysis_tpu.io.bundle import materialize_bundle_view

    with _pytest.raises(ValueError, match="sample rates"):
        materialize_bundle_view([w1, w4], tmp_path / "bad")


def test_materialize_bundle_view_edge_cases(tmp_path):
    """View materialisation: missing/empty inputs fail up front with clear
    errors, expected-rate enforcement works, and re-materialising over an
    existing view re-points taps at the new sources."""
    import json

    import numpy as np
    import pytest

    from audio_analysis_tpu.io.bundle import materialize_bundle_view
    from audio_analysis_tpu.io.wav import write_wav_pcm16

    sr, n = 48_000, 4096
    x = np.zeros((n, 2), np.float32)
    x[16, :] = 0.9
    w1 = tmp_path / "one.wav"
    w2 = tmp_path / "two.wav"
    write_wav_pcm16(w1, x, sr)
    write_wav_pcm16(w2, x * 0.5, sr)

    with pytest.raises(ValueError, match="no input WAV"):
        materialize_bundle_view([], tmp_path / "v0")
    with pytest.raises(ValueError, match="not found"):
        materialize_bundle_view([tmp_path / "missing.wav"], tmp_path / "v0")
    with pytest.raises(ValueError, match="expected 44100"):
        materialize_bundle_view([w1], tmp_path / "v0", expected_sample_rate_hz=44_100)

    root = materialize_bundle_view([w1], tmp_path / "view")
    assert json.loads((root / "meta.json").read_text())["taps"] == ["one"]

    # idempotent re-materialise (same target): the symlink survives
    materialize_bundle_view([w1], tmp_path / "view")
    assert (root / "taps" / "one.wav").resolve() == w1.resolve()

    # re-materialise with a DIFFERENT source under the same tap name:
    # the stale link must be re-pointed, not silently kept
    (tmp_path / "sub").mkdir()
    w1b = tmp_path / "sub" / "one.wav"
    write_wav_pcm16(w1b, x * 0.25, sr)
    materialize_bundle_view([w1b, w2], tmp_path / "view")
    meta = json.loads((root / "meta.json").read_text())
    assert meta["taps"] == ["one", "two"]
    assert (root / "taps" / "one.wav").resolve() == w1b.resolve()

    # shrinking the input set prunes stale taps (no phantom taps/*.wav)
    materialize_bundle_view([w2], tmp_path / "view")
    assert sorted(p.name for p in (root / "taps").glob("*.wav")) == ["two.wav"]

    # a REAL bundle (no view marker) is never overwritten or pruned
    real = tmp_path / "real_bundle"
    (real / "taps").mkdir(parents=True)
    (real / "meta.json").write_text('{"taps": ["precious"]}')
    (real / "taps" / "precious.wav").write_bytes(b"not really wav")
    with pytest.raises(ValueError, match="not a batch view"):
        materialize_bundle_view([w1], real)
    assert (real / "taps" / "precious.wav").exists()
    assert json.loads((real / "meta.json").read_text()) == {"taps": ["precious"]}

    # the header-only probe agrees with the decoders (frames, channels, rate)
    from audio_analysis_tpu.io.wav import wav_header_info

    assert wav_header_info(w1) == (n, 2, sr)
    assert wav_header_info(tmp_path / "missing.wav") is None
    bogus = tmp_path / "bogus.wav"
    bogus.write_bytes(b"RIFFxxxxWAVE" + b"\x00" * 4)
    assert wav_header_info(bogus) is None


def test_cli_json_flag(tmp_path, capsys, ir_wav):
    """--json on a subcommand writes the result pytree next to the summary."""
    from audio_analysis_tpu.cli import analyse_cli

    out_json = tmp_path / "fr.json"
    analyse_cli.main(
        ["fr", "--input", str(ir_wav), "--no_show", "--json", str(out_json)]
    )
    out = capsys.readouterr().out
    assert f"Wrote JSON: {out_json}" in out

    import json as _json

    data = _json.loads(out_json.read_text())
    assert data[0]["channel_name"] == "left"
    assert data[0]["peak_frequency_hz"] > 0
