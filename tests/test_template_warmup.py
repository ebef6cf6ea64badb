"""
Figure-template warmup (report/warmup.py): the warmup report's template
keys must structurally match a realistic tap's keys, kind by kind — a
mismatch silently turns the warmup into wasted work (the real render
rebuilds fresh) with no correctness symptom, so reuse is pinned here.
"""

from dataclasses import replace

import numpy as np
import pytest

import audio_analysis_tpu.plot as P
from audio_analysis_tpu.io.wav import write_wav_pcm16
from audio_analysis_tpu.report.report import ReportSettings, run_report_from_wav_file
from audio_analysis_tpu.report.warmup import warmup_figure_templates

# every templated figure kind the report suite renders (rt60bands draws a
# bar chart — not templated, and cheap)
WARMED_KINDS = {
    "ir_full", "ir_early", "ir_tail", "decay", "frequency_response",
    "group_delay", "diffusion", "spectrogram", "modal_cloud", "waterfall3d",
}


@pytest.fixture(autouse=True)
def fresh_template_state():
    import audio_analysis_tpu.report.warmup as W

    old = P.FIGURE_TEMPLATES_ENABLED
    old_done = W._WARMUP_DONE
    P.FIGURE_TEMPLATES_ENABLED = True
    W._WARMUP_DONE = False  # an earlier bundle test may have completed one
    P.clear_figure_templates()
    P.clear_tight_bbox_cache()
    yield
    P.FIGURE_TEMPLATES_ENABLED = old
    W._WARMUP_DONE = old_done
    P.clear_figure_templates()
    P.clear_tight_bbox_cache()


def _realistic_tap_wav(tmp_path):
    sr, n = 48_000, 32_768
    t = np.arange(n) / sr
    rng = np.random.default_rng(11)
    x = np.zeros((n, 2), np.float32)
    env = 10.0 ** (-3.0 * t / 0.2)
    x[64:, :] = (0.05 * rng.standard_normal((n - 64, 2)) * env[: n - 64, None]).astype(
        np.float32
    )
    x[64, :] = 0.9
    path = tmp_path / "tap.wav"
    write_wav_pcm16(path, x, sr)
    return path


def test_warmup_templates_are_reused_by_real_taps(tmp_path):
    settings = ReportSettings()
    warmup_figure_templates(settings)

    warmed = {kind: id(entry[1]) for kind, entry in P._FIGURE_TEMPLATES.items()}
    assert WARMED_KINDS <= set(warmed), (
        f"warmup built {sorted(warmed)} — missing "
        f"{sorted(WARMED_KINDS - set(warmed))}"
    )

    wav = _realistic_tap_wav(tmp_path)
    run_report_from_wav_file(
        wav,
        tmp_path / "out" / "tap",
        settings=replace(
            settings, overlap_plotting=False, warmup_figure_templates=False
        ),
    )

    rebuilt = [
        kind
        for kind in WARMED_KINDS
        if id(P._FIGURE_TEMPLATES[kind][1]) != warmed[kind]
    ]
    assert not rebuilt, (
        f"real tap rebuilt templates for {sorted(rebuilt)} — the warmup key "
        "no longer matches the real render's key for these kinds"
    )


def test_warmup_never_raises(monkeypatch):
    """Warmup is best-effort: an internal failure must be swallowed."""
    import audio_analysis_tpu.report.warmup as W

    monkeypatch.setattr(W, "tempfile", None)  # breaks mkdtemp -> AttributeError
    warmup_figure_templates(ReportSettings())  # must not raise


def test_warmup_is_noop_after_a_completed_warmup(monkeypatch):
    """A process whose warmup already COMPLETED (a previous bundle run)
    must not pay the tiny-report cost again — the iterate loop calls
    run_bundle_report per re-recorded bundle in one long-lived service
    process. A merely NON-EMPTY template dict (e.g. a prior single-file
    report built one kind's template) must NOT suppress the warmup: the
    other kinds would then pay their builds in front of the first tap."""
    import audio_analysis_tpu.report.warmup as W

    import matplotlib.pyplot as plt

    ran = {"n": 0}

    def count_and_fail(*a, **k):
        ran["n"] += 1
        raise RuntimeError("stop before the report")  # swallowed (best-effort)

    monkeypatch.setattr(W.tempfile, "mkdtemp", count_and_fail)

    # partial templates alone do not skip
    P._FIGURE_TEMPLATES["sentinel"] = ((), plt.figure(), {})
    try:
        monkeypatch.setattr(W, "_WARMUP_DONE", False)
        warmup_figure_templates(ReportSettings())
        assert ran["n"] == 1, "partial templates must not suppress warmup"

        # a completed warmup does skip
        monkeypatch.setattr(W, "_WARMUP_DONE", True)
        warmup_figure_templates(ReportSettings())
        assert ran["n"] == 1, "warmup re-ran after a completed warmup"
    finally:
        entry = P._FIGURE_TEMPLATES.pop("sentinel", None)
        if entry is not None:
            plt.close(entry[1])
