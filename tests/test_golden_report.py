"""
Golden regression: the full report over a frozen synthetic IR must keep its
structure exactly and its numbers within tolerance (the diffable-output
contract the reference establishes with plots/example/verb_report.md).

Regenerate the golden after an intentional change with:
    python tests/regen_golden.py
"""

from pathlib import Path

import pytest

from tests.golden_utils import GOLDEN_DIR, SR, compare_reports, make_golden_ir


@pytest.mark.skipif(
    not (GOLDEN_DIR / "verb_report_golden.md").exists(),
    reason="golden not generated yet (run tests/regen_golden.py)",
)
def test_full_report_matches_golden(tmp_path):
    from audio_analysis_tpu.io import write_wav_pcm16
    from audio_analysis_tpu.report import ReportSettings, run_report_from_wav_file

    ir = make_golden_ir()
    wav = tmp_path / "golden_ir.wav"
    write_wav_pcm16(wav, ir, SR)

    base = tmp_path / "out" / "golden"
    results = run_report_from_wav_file(wav, base, ReportSettings())

    golden_md = (GOLDEN_DIR / "verb_report_golden.md").read_text()
    compare_reports(golden_md, results.summary_markdown)


def test_golden_input_is_stable():
    """The frozen input itself must never drift (seeded generator)."""
    import numpy as np

    ir = make_golden_ir()
    assert ir.shape == (1 << 16, 2)
    assert float(ir[480, 0]) == pytest.approx(0.9)
    # fingerprint a few fixed samples
    fingerprint = np.array([ir[1000, 0], ir[5000, 1], ir[30000, 0]], dtype=np.float64)
    expected = np.array(
        [-0.051672086119651794, 0.023636069148778915, 0.00035587642923928797]
    )
    np.testing.assert_allclose(fingerprint, expected, rtol=1e-6)
