"""Regenerate the golden report (run after intentional format changes)."""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# honor AA_PLATFORM=cpu like the conftest does (the axon startup hook
# re-pins jax_platforms, so a plain JAX_PLATFORMS env var is not enough —
# and with the TPU pool down, default backend init hangs)
from audio_analysis_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

from tests.golden_utils import GOLDEN_DIR, SR, make_golden_ir  # noqa: E402


def main() -> None:
    from audio_analysis_tpu.io import write_wav_pcm16
    from audio_analysis_tpu.report import ReportSettings, run_report_from_wav_file

    GOLDEN_DIR.mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        wav = Path(td) / "golden_ir.wav"
        write_wav_pcm16(wav, make_golden_ir(), SR)
        results = run_report_from_wav_file(wav, Path(td) / "golden", ReportSettings())
        (GOLDEN_DIR / "verb_report_golden.md").write_text(results.summary_markdown)
    print(f"wrote {GOLDEN_DIR / 'verb_report_golden.md'}")


if __name__ == "__main__":
    main()
