"""
LIVE cross-tool parity over a settings matrix.

test_reference_parity.py pins default-settings parity against vendored
fixtures; this suite runs the actual reference implementation
(/root/reference, in a subprocess so its `analyse` package doesn't
collide with this repo's shims) across tests/parity_matrix.VARIANTS —
non-default trim/duration policies, band modes, STFT geometries,
waterfall slice modes, smoothing, phase modes — and asserts this
framework's summaries agree: identical structure, numbers within the
per-module tolerances of test_reference_parity (or the variant's own
override).
"""

from __future__ import annotations

import importlib
import json
import os
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

import golden_utils
import parity_matrix
from test_reference_parity import TOLERANCES

REFERENCE = "/root/reference"
_ANY_NUM = re.compile(r"-?\d+(?:\.\d+)?")

ANALYSE_FNS = {
    "decay": ("decay", "analyse_decay_from_wav_file", "DecayAnalysisSettings",
              "summarise_decay_results_text"),
    "rt60bands": ("rt60bands", "analyse_rt60_bands_from_wav_file",
                  "Rt60BandsAnalysisSettings", "summarise_rt60_bands_results_text"),
    "frequency_response": ("frequency_response",
                           "analyse_frequency_response_from_wav_file",
                           "FrequencyResponseAnalysisSettings",
                           "summarise_frequency_response_results_text"),
    "spectrogram": ("spectrogram", "analyse_spectrogram_from_wav_file",
                    "SpectrogramAnalysisSettings", "summarise_spectrogram_results_text"),
    "waterfall": ("waterfall", "analyse_waterfall_from_wav_file",
                  "WaterfallAnalysisSettings", "summarise_waterfall_results_text"),
    "modalcloud": ("modalcloud", "analyse_modal_cloud_from_wav_file",
                   "ModalCloudAnalysisSettings", "summarise_modal_cloud_results_text"),
    "diffusion": ("diffusion", "analyse_diffusion_from_wav_file",
                  "DiffusionAnalysisSettings", "summarise_diffusion_results_text"),
    "group_delay": ("group_delay", "analyse_group_delay_from_wav_file",
                    "GroupDelayAnalysisSettings", "summarise_group_delay_results_text"),
    "filterplot": ("filterplot", "analyse_filter_response_from_wav_file",
                   "FilterAnalysisSettings", "summarise_filter_response_results_text"),
    "zplane": ("zplane", "analyse_zplane_from_wav_file",
               "ZPlaneAnalysisSettings", "summarise_zplane_results_text"),
}


@pytest.fixture(scope="module")
def matrix_wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_matrix")
    paths = {}
    for key, ir in (
        ("noise", golden_utils.make_golden_ir()),
        ("modal", parity_matrix.make_modal_ir()),
        ("damped", parity_matrix.make_damped_ir()),
        ("oddmono", parity_matrix.make_oddmono_ir()),
        ("sweep", parity_matrix.make_sweep()[:, None]),
        ("recorded", parity_matrix.make_recorded(golden_utils.make_golden_ir())),
    ):
        path = root / f"{key}_ir.wav"
        wavfile.write(str(path), parity_matrix.SR,
                      (np.clip(ir, -1, 1) * 32767.0).astype(np.int16))
        paths[key] = str(path)
    return paths


@pytest.fixture(scope="module")
def reference_summaries(matrix_wavs, tmp_path_factory):
    """All reference-tool summaries, computed once in one subprocess."""
    if not Path(REFERENCE, "analyse", "__init__.py").exists():
        pytest.skip("reference tree not mounted")
    out = tmp_path_factory.mktemp("parity_matrix_out") / "reference.json"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["MPLBACKEND"] = "Agg"
    subprocess.run(
        [sys.executable, str(Path(__file__).parent / "_reference_matrix_runner.py"),
         "--reference", REFERENCE,
         "--noise-wav", matrix_wavs["noise"],
         "--modal-wav", matrix_wavs["modal"],
         "--damped-wav", matrix_wavs["damped"],
         "--oddmono-wav", matrix_wavs["oddmono"],
         "--sweep-wav", matrix_wavs["sweep"],
         "--recorded-wav", matrix_wavs["recorded"],
         "--deconv-dir", str(out.parent / "deconv"),
         "--out", str(out)],
        check=True, env=env, timeout=900,
    )
    return json.loads(out.read_text())


def _compare_texts(name: str, ref: str, got: str, rel: float, abs_: float) -> None:
    ref, got = ref.rstrip(), got.rstrip()
    ref_skel = [_ANY_NUM.sub("#", line) for line in ref.splitlines()]
    got_skel = [_ANY_NUM.sub("#", line) for line in got.splitlines()]
    assert ref_skel == got_skel, (
        f"{name}: summary structure drifted from the reference tool\n"
        f"--- reference ---\n{ref}\n--- ours ---\n{got}"
    )
    ref_nums = [float(v) for v in _ANY_NUM.findall(ref)]
    got_nums = [float(v) for v in _ANY_NUM.findall(got)]
    assert len(ref_nums) == len(got_nums)
    for i, (a, b) in enumerate(zip(ref_nums, got_nums)):
        tol = max(abs_, rel * max(abs(a), abs(b)))
        assert abs(a - b) <= tol, f"{name}: value {i} reference={a} ours={b} (tol {tol})"


@pytest.mark.parametrize("name", [v["name"] for v in parity_matrix.VARIANTS])
def test_variant_matches_reference(name, matrix_wavs, reference_summaries):
    variant = parity_matrix.variant_by_name(name)
    mod_name, analyse_name, settings_name, summarise_name = ANALYSE_FNS[variant["module"]]
    mod = importlib.import_module(f"audio_analysis_tpu.analyses.{mod_name}")

    kwargs = parity_matrix.settings_kwargs(variant)
    kwargs.update(variant.get("ours_extra", {}))  # our-side-only fields (e.g. exact_grid)
    settings = getattr(mod, settings_name)(**kwargs)
    results = getattr(mod, analyse_name)(matrix_wavs[variant["input"]], settings)
    ours = getattr(mod, summarise_name)(results, **variant.get("summary", {}))

    rel, abs_ = variant.get("tol") or TOLERANCES[variant["module"]]
    _compare_texts(name, reference_summaries[name], ours, rel, abs_)


@pytest.mark.parametrize("name", [v["name"] for v in parity_matrix.DECONVOLVE_VARIANTS])
def test_deconvolve_matches_reference(name, matrix_wavs, reference_summaries, tmp_path):
    """Waveform-level parity: deconvolve has no text summary, so the two
    tools' float32 IR WAVs are compared sample by sample (same PCM16
    inputs, same next-pow2 FFT grid — only f32-vs-f64 FFT drift left)."""
    from audio_analysis_tpu.analyses import deconvolve as dc

    variant = next(v for v in parity_matrix.DECONVOLVE_VARIANTS if v["name"] == name)
    ours_path = tmp_path / f"{name}_ours.wav"
    dc.deconvolve_from_wav_files(
        matrix_wavs["recorded"], matrix_wavs["sweep"],
        dc.DeconvolveSettings(**variant["settings"]),
        output_ir_wav_file_path=ours_path,
    )
    sr_ref, ref = wavfile.read(reference_summaries[f"deconvolve:{name}"])
    sr_got, got = wavfile.read(str(ours_path))
    assert sr_ref == sr_got and ref.shape == got.shape
    peak = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(got, ref, atol=2e-4 * peak)
