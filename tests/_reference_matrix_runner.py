"""
Subprocess worker: run the REFERENCE tool over the parity-variant matrix.

Launched by tests/test_reference_parity_matrix.py with the reference tree
prepended to sys.path (so `analyse` resolves to /root/reference/analyse,
not this repo's compatibility shims — which is also why this must be a
separate process). Pure NumPy/SciPy/matplotlib; never imports jax.

    python tests/_reference_matrix_runner.py --reference /root/reference \
        --noise-wav N.wav --modal-wav M.wav --out OUT.json

Writes {variant_name: summary_text} JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", required=True)
    parser.add_argument("--noise-wav", required=True)
    parser.add_argument("--modal-wav", required=True)
    parser.add_argument("--damped-wav", required=True)
    parser.add_argument("--oddmono-wav", required=True)
    parser.add_argument("--sweep-wav", required=True)
    parser.add_argument("--recorded-wav", required=True)
    parser.add_argument("--deconv-dir", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    sys.path.insert(0, args.reference)

    import matplotlib

    matplotlib.use("Agg")

    import parity_matrix  # script dir (tests/) is sys.path[0]'s sibling entry

    from analyse import (  # the REFERENCE package
        decay,
        diffusion,
        filterplot,
        frequency_response,
        group_delay,
        modalcloud,
        rt60bands,
        spectrogram,
        waterfall,
        zplane,
    )

    wavs = {"noise": args.noise_wav, "modal": args.modal_wav,
            "damped": args.damped_wav, "oddmono": args.oddmono_wav}

    def run_group_delay(path: str, settings_kwargs: dict) -> list:
        # The reference has no plot-free analysis entry for group delay —
        # its plot function returns the channel results (group_delay.py:140).
        with tempfile.TemporaryDirectory(prefix="gd_ref_") as tmp:
            return group_delay.plot_group_delay_from_wav_file(
                path,
                group_delay.GroupDelayAnalysisSettings(**settings_kwargs),
                group_delay.GroupDelayPlotSettings(),
                output_basename=str(Path(tmp) / "gd"),
                show_interactive=False,
            )

    def run_zplane(path: str, settings_kwargs: dict) -> list:
        # Like group delay, the reference's z-plane analysis entry is its
        # plot function (zplane.py:176), which returns the channel results.
        with tempfile.TemporaryDirectory(prefix="zp_ref_") as tmp:
            return zplane.plot_zplane_from_wav_file(
                path,
                zplane.ZPlaneAnalysisSettings(**settings_kwargs),
                zplane.ZPlanePlotSettings(),
                output_basename=str(Path(tmp) / "zp"),
                show_interactive=False,
            )

    modules = {
        "zplane": (run_zplane, zplane.summarise_zplane_results_text),
        "decay": (
            lambda p, kw: decay.analyse_decay_from_wav_file(
                p, decay.DecayAnalysisSettings(**kw)
            ),
            decay.summarise_decay_results_text,
        ),
        "rt60bands": (
            lambda p, kw: rt60bands.analyse_rt60_bands_from_wav_file(
                p, rt60bands.Rt60BandsAnalysisSettings(**kw)
            ),
            rt60bands.summarise_rt60_bands_results_text,
        ),
        "frequency_response": (
            lambda p, kw: frequency_response.analyse_frequency_response_from_wav_file(
                p, frequency_response.FrequencyResponseAnalysisSettings(**kw)
            ),
            frequency_response.summarise_frequency_response_results_text,
        ),
        "spectrogram": (
            lambda p, kw: spectrogram.analyse_spectrogram_from_wav_file(
                p, spectrogram.SpectrogramAnalysisSettings(**kw)
            ),
            spectrogram.summarise_spectrogram_results_text,
        ),
        "waterfall": (
            lambda p, kw: waterfall.analyse_waterfall_from_wav_file(
                p, waterfall.WaterfallAnalysisSettings(**kw)
            ),
            waterfall.summarise_waterfall_results_text,
        ),
        "modalcloud": (
            lambda p, kw: modalcloud.analyse_modal_cloud_from_wav_file(
                p, modalcloud.ModalCloudAnalysisSettings(**kw)
            ),
            modalcloud.summarise_modal_cloud_results_text,
        ),
        "diffusion": (
            lambda p, kw: diffusion.analyse_diffusion_from_wav_file(
                p, diffusion.DiffusionAnalysisSettings(**kw)
            ),
            diffusion.summarise_diffusion_results_text,
        ),
        "group_delay": (run_group_delay, group_delay.summarise_group_delay_results_text),
        "filterplot": (
            lambda p, kw: filterplot.analyse_filter_response_from_wav_file(
                p, filterplot.FilterAnalysisSettings(**kw)
            ),
            filterplot.summarise_filter_response_results_text,
        ),
    }

    out = {}
    for variant in parity_matrix.VARIANTS:
        analyse_fn, summarise_fn = modules[variant["module"]]
        results = analyse_fn(wavs[variant["input"]], parity_matrix.settings_kwargs(variant))
        out[variant["name"]] = summarise_fn(results, **variant.get("summary", {}))

    from analyse import deconvolve  # the REFERENCE module

    deconv_dir = Path(args.deconv_dir)
    deconv_dir.mkdir(parents=True, exist_ok=True)
    for variant in parity_matrix.DECONVOLVE_VARIANTS:
        ir_path = deconv_dir / f"{variant['name']}.wav"
        deconvolve.deconvolve_from_wav_files(
            args.recorded_wav,
            args.sweep_wav,
            deconvolve.DeconvolveSettings(**variant["settings"]),
            output_ir_wav_file_path=ir_path,
        )
        out[f"deconvolve:{variant['name']}"] = str(ir_path)

    Path(args.out).write_text(json.dumps(out))


if __name__ == "__main__":
    main()
