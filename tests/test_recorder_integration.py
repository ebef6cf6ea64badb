"""
End-to-end bundle contract: C++ AnalysisRecorder -> filesystem bundle ->
native loader -> fused engine report.

The recorder_demo binary simulates a real-time DSP process (two feedback
combs fed by an impulse, ANALYSE_TAP per sample, tick() per block —
cpp/recorder_demo.cpp) and writes the bundle exactly as a user engine
would. A feedback comb with gain g and delay D samples decays
20*log10(g) dB every D samples, so its theoretical RT60 is
  RT60 = 60 * D / (sr * -20*log10(g))
which the engine's T30 fit must recover.
"""

import math
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
DEMO = REPO / "cpp" / "build" / "recorder_demo"

SR = 48_000
# (name, feedback gain, delay samples) — must match cpp/recorder_demo.cpp
COMBS = [("comb_a", 0.93, 997), ("comb_b", 0.88, 1409)]


def comb_rt60(gain: float, delay: int) -> float:
    return 60.0 * delay / (SR * (-20.0 * math.log10(gain)))


@pytest.mark.skipif(not DEMO.exists(), reason="recorder_demo not built (make -C cpp)")
def test_recorder_bundle_through_engine(tmp_path):
    run = subprocess.run(
        [str(DEMO), str(tmp_path), "512", "256"], capture_output=True, timeout=120
    )
    assert run.returncode == 0, run.stderr.decode()

    bundles = [p for p in tmp_path.iterdir() if (p / "meta.json").exists()]
    assert len(bundles) == 1
    bundle = bundles[0]
    for name, _, _ in COMBS:
        assert (bundle / "taps" / f"{name}.wav").exists()

    from audio_analysis_tpu.report.engine_report import run_bundle_report_engine

    index = run_bundle_report_engine(bundle)
    assert index.exists()

    import json

    metrics = json.loads((bundle / "reports" / "bundle_metrics.json").read_text())
    taps = metrics["taps"]
    t30 = np.asarray(metrics["metrics"]["t30_rt60"])
    ok = np.asarray(metrics["metrics"]["t30_ok"])
    for name, gain, delay in COMBS:
        i = taps.index(name)
        assert np.all(ok[i]), f"{name}: T30 fit not ok"
        expected = comb_rt60(gain, delay)
        measured = float(np.mean(t30[i]))
        assert measured == pytest.approx(expected, rel=0.02), (name, measured, expected)
