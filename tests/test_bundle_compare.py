"""Run-to-run bundle comparison (report/compare.py + bundle --compare)."""

import numpy as np
import pytest

from audio_analysis_tpu.io import write_bundle
from audio_analysis_tpu.report.compare import format_bundle_comparison, load_bundle_metrics

SR = 48_000


def _metrics(taps, t30, ok=None, channels=("left", "right")):
    """Minimal metrics dict in the bundle_metrics.json layout."""
    t30 = np.asarray(t30, np.float64)
    return {
        "taps": list(taps),
        "channels": list(channels),
        "metrics": {
            "t30_rt60": t30.tolist(),
            "t30_ok": (np.ones_like(t30, bool) if ok is None else np.asarray(ok)).tolist(),
        },
    }


def test_no_changes_below_threshold():
    a = _metrics(["tap0"], [[0.500, 0.500]])
    b = _metrics(["tap0"], [[0.502, 0.500]])  # +0.4%
    text = format_bundle_comparison(b, a, threshold_pct=1.0)
    assert "No changes above threshold." in text


def test_flags_change_above_threshold_with_channel_and_sign():
    a = _metrics(["tap0", "tap1"], [[0.500, 0.500], [0.400, 0.400]])
    b = _metrics(["tap0", "tap1"], [[0.500, 0.550], [0.400, 0.400]])
    text = format_bundle_comparison(b, a, threshold_pct=1.0)
    assert "- tap0 [right] t30_rt60: 0.5000 -> 0.5500 (+9.1%)" in text
    assert "tap1" not in text


def test_ok_flip_and_nan_transition_reported():
    a = _metrics(["tap0"], [[0.500, 0.500]], ok=[[True, True]])
    b = _metrics(["tap0"], [[0.500, float("nan")]], ok=[[True, False]])
    text = format_bundle_comparison(b, a, threshold_pct=1.0)
    assert "- tap0 [right] t30_ok: True -> False" in text
    assert "0.5000 -> nan" in text


def test_near_zero_noise_is_not_flagged():
    """Sub-milli-unit jitter on a near-zero metric is numeric noise: the
    relative threshold alone would flag it at up to 100%."""
    a = _metrics(["tap0"], [[0.0002, 0.5]])
    b = _metrics(["tap0"], [[0.0001, 0.5]])
    text = format_bundle_comparison(b, a, threshold_pct=1.0)
    assert "No changes above threshold." in text


def test_missing_metric_family_is_a_regression():
    """A key present previously but absent now (block disabled, renamed)
    must be flagged, not silently skipped."""
    a = _metrics(["tap0"], [[0.5, 0.5]])
    b = _metrics(["tap0"], [[0.5, 0.5]])
    del b["metrics"]["t30_rt60"]
    text = format_bundle_comparison(b, a)
    assert "- t30_rt60: missing from current run (was present)" in text


def test_added_removed_taps_and_channel_mismatch():
    a = _metrics(["tap0", "gone"], [[0.5, 0.5], [0.4, 0.4]])
    b = _metrics(["tap0", "new"], [[0.5, 0.5], [0.4, 0.4]])
    text = format_bundle_comparison(b, a)
    assert "- new: new tap (not in previous run)" in text
    assert "- gone: removed (was in previous run)" in text

    mono = _metrics(["tap0"], [[0.5]], channels=("mono",))
    text2 = format_bundle_comparison(mono, a)
    assert "channel layout changed" in text2


def test_engine_bundle_compare_end_to_end(tmp_path):
    """Two engine runs over a changed bundle: the index's comparison section
    flags the changed tap's T30 and stays silent about the unchanged one.
    Uses the same reports dir in place (previous file read before
    overwrite)."""
    from audio_analysis_tpu.report import EngineBundleSettings, run_bundle_report_engine

    n = 1 << 14
    rng = np.random.default_rng(11)
    t = np.arange(n) / SR

    def tap(rt60):
        x = np.zeros((n, 2), np.float32)
        x[10:, :] = (
            0.05 * rng.standard_normal((n - 10, 2)) * 10 ** (-3 * t[: n - 10, None] / rt60)
        )
        x[10, :] = 0.9
        return x

    stable = tap(0.25)
    root = write_bundle(tmp_path / "run", {"changed": tap(0.2), "stable": stable}, SR)
    run_bundle_report_engine(root, EngineBundleSettings())

    # simulate a DSP change: the "changed" tap decays slower now
    write_bundle(tmp_path / "run", {"changed": tap(0.3), "stable": stable}, SR)
    index = run_bundle_report_engine(
        root,
        EngineBundleSettings(compare_to=str(root / "reports"), compare_threshold_pct=5.0),
    )
    content = index.read_text()
    assert "## Changes vs" in content
    assert any(
        line.startswith("- changed [") and "t30_rt60" in line
        for line in content.splitlines()
    ), content
    assert "- stable [" not in content

    # a bogus previous path degrades to a note, not a failure
    index2 = run_bundle_report_engine(
        root, EngineBundleSettings(compare_to=str(tmp_path / "nowhere"))
    )
    assert "Comparison unavailable" in index2.read_text()


def test_load_bundle_metrics_resolution(tmp_path):
    with pytest.raises(FileNotFoundError, match="bundle_metrics.json"):
        load_bundle_metrics(tmp_path)


def test_cli_fail_on_change_gate(tmp_path):
    """--compare --fail-on-change exits 3 when metrics moved, 0 otherwise —
    the CI regression gate."""
    from audio_analysis_tpu.cli import analyse_cli

    n = 1 << 14
    rng = np.random.default_rng(12)
    t = np.arange(n) / SR

    def tap(rt60):
        x = np.zeros((n, 2), np.float32)
        x[10:, :] = (
            0.05 * rng.standard_normal((n - 10, 2)) * 10 ** (-3 * t[: n - 10, None] / rt60)
        )
        x[10, :] = 0.9
        return x

    root = write_bundle(tmp_path / "run", {"tap": tap(0.25)}, SR)
    analyse_cli.main(["bundle", "--input", str(root), "--no-plots"])

    # unchanged bundle: compare in place, no flagged changes, exit 0
    analyse_cli.main(
        ["bundle", "--input", str(root), "--no-plots",
         "--compare", str(root / "reports"), "--fail-on-change"]
    )

    # regression: exit code 3
    write_bundle(tmp_path / "run", {"tap": tap(0.4)}, SR)
    with pytest.raises(SystemExit) as exc_info:
        analyse_cli.main(
            ["bundle", "--input", str(root), "--no-plots",
             "--compare", str(root / "reports"), "--fail-on-change",
             "--compare-threshold", "5"]
        )
    assert exc_info.value.code == 3


def test_cli_standalone_compare_subcommand(tmp_path, capsys):
    """`analyse compare PREV CUR` diffs two existing metrics dumps without
    re-analyzing; --fail-on-change exits 3."""
    import json

    from audio_analysis_tpu.cli import analyse_cli

    (tmp_path / "a.json").write_text(json.dumps(_metrics(["t"], [[0.5, 0.5]])))
    (tmp_path / "b.json").write_text(json.dumps(_metrics(["t"], [[0.5, 0.6]])))

    analyse_cli.main(["compare", str(tmp_path / "a.json"), str(tmp_path / "b.json")])
    out = capsys.readouterr().out
    assert "t [right] t30_rt60: 0.5000 -> 0.6000" in out

    # identical runs: no flag, exit normally even with the gate
    analyse_cli.main(
        ["compare", str(tmp_path / "a.json"), str(tmp_path / "a.json"), "--fail-on-change"]
    )
    capsys.readouterr()

    with pytest.raises(SystemExit) as exc_info:
        analyse_cli.main(
            ["compare", str(tmp_path / "a.json"), str(tmp_path / "b.json"),
             "--fail-on-change"]
        )
    assert exc_info.value.code == 3
    capsys.readouterr()


def test_cli_compare_rejected_on_plot_path(tmp_path):
    """--compare on the plot-only path would be silently dropped (the
    metrics come from the engine) — the gate must refuse, not vacuously
    pass. Engine paths (--no-plots, --multi-host) both have wiring."""
    from audio_analysis_tpu.cli import analyse_cli

    with pytest.raises(SystemExit, match="no-plots or"):
        analyse_cli.main(
            ["bundle", "--input", str(tmp_path),
             "--compare", "somewhere", "--fail-on-change"]
        )
