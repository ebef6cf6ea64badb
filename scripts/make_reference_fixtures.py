"""
Vendor ACTUAL reference-tool output as parity fixtures.

Runs the reference implementation (/root/reference, pure NumPy/SciPy) on the
frozen golden IR and stores each module's deterministic text summary under
tests/golden/reference/. tests/test_reference_parity.py then asserts this
framework's summaries match those numbers within stated tolerances — pinning
cross-tool drift with the reference's own output rather than a formula
re-derivation (advisor finding r1).

Usage (one-off, output committed):
    python scripts/make_reference_fixtures.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))

import golden_utils  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    args = parser.parse_args()

    sys.path.insert(0, args.reference)

    import matplotlib

    matplotlib.use("Agg")

    from scipy.io import wavfile

    import tempfile

    out_dir = REPO / "tests" / "golden" / "reference"
    out_dir.mkdir(parents=True, exist_ok=True)
    # scratch artifacts go to a real temp dir, NOT the committed fixtures
    # dir — a mid-run exception must not leave _tmp_* files where they
    # could be committed
    tmp_ctx = tempfile.TemporaryDirectory(prefix="ref_fixtures_")
    tmp_dir = Path(tmp_ctx.name)

    ir = golden_utils.make_golden_ir()
    wav_path = tmp_dir / "golden_ir.wav"
    pcm = np.clip(ir, -1.0, 1.0)
    wavfile.write(str(wav_path), golden_utils.SR, (pcm * 32767.0).astype(np.int16))

    fixtures = {}

    from analyse import decay

    fixtures["decay"] = decay.summarise_decay_results_text(
        decay.analyse_decay_from_wav_file(str(wav_path), decay.DecayAnalysisSettings())
    )

    from analyse import rt60bands

    rt = rt60bands.analyse_rt60_bands_from_wav_file(
        str(wav_path), rt60bands.Rt60BandsAnalysisSettings()
    )
    fixtures["rt60bands"] = rt60bands.summarise_rt60_bands_results_text(
        rt, include_t20=False, include_edt=False
    )

    from analyse import frequency_response as fr

    fixtures["frequency_response"] = fr.summarise_frequency_response_results_text(
        fr.analyse_frequency_response_from_wav_file(
            str(wav_path), fr.FrequencyResponseAnalysisSettings()
        )
    )

    from analyse import spectrogram as sg

    fixtures["spectrogram"] = sg.summarise_spectrogram_results_text(
        sg.analyse_spectrogram_from_wav_file(str(wav_path), sg.SpectrogramAnalysisSettings())
    )

    from analyse import waterfall as wf

    fixtures["waterfall"] = wf.summarise_waterfall_results_text(
        wf.analyse_waterfall_from_wav_file(str(wav_path), wf.WaterfallAnalysisSettings())
    )

    from analyse import modalcloud as mc

    fixtures["modalcloud"] = mc.summarise_modal_cloud_results_text(
        mc.analyse_modal_cloud_from_wav_file(str(wav_path), mc.ModalCloudAnalysisSettings())
    )

    from analyse import diffusion as df

    fixtures["diffusion"] = df.summarise_diffusion_results_text(
        df.analyse_diffusion_from_wav_file(str(wav_path), df.DiffusionAnalysisSettings())
    )

    from analyse import filterplot as fp

    fixtures["filterplot"] = fp.summarise_filter_response_results_text(
        fp.analyse_filter_response_from_wav_file(str(wav_path), fp.FilterAnalysisSettings())
    )

    from analyse import group_delay as gd

    fixtures["group_delay"] = gd.summarise_group_delay_results_text(
        gd.plot_group_delay_from_wav_file(
            str(wav_path),
            gd.GroupDelayAnalysisSettings(),
            gd.GroupDelayPlotSettings(),
            output_basename=str(tmp_dir / "gd"),
            show_interactive=False,
        )
    )

    for name, text in fixtures.items():
        (out_dir / f"{name}.txt").write_text(text.rstrip() + "\n")
        print(f"wrote {name}.txt")

    tmp_ctx.cleanup()


if __name__ == "__main__":
    main()
