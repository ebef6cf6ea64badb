"""
Engine fast-path summaries vs per-module summaries on the same WAV.

The bundle engine (`report/engine_report.format_tap_summary`) re-renders the
reference text formats from fused-engine outputs; the analyses modules
render them from their own per-file runs (e.g. decay.py:502-542 formats).
The two report flavours must not drift: for every numeric line the engine
emits, the corresponding module summary must contain a line with the SAME
non-numeric skeleton and numerically-agreeing values.
"""

import re
from pathlib import Path
from typing import List, Tuple

import numpy as np
import pytest

_NUM = re.compile(r"-?\d+\.\d+|-?\d+")


def _skeleton_and_numbers(line: str) -> Tuple[str, List[str]]:
    """Replace every numeric token with '#'; return (skeleton, tokens)."""
    tokens = _NUM.findall(line)
    return _NUM.sub("#", line), tokens


def _assert_numbers_close(engine_tok: List[str], module_tok: List[str], where: str) -> None:
    assert len(engine_tok) == len(module_tok), where
    for a_s, b_s in zip(engine_tok, module_tok):
        if "." not in a_s and "." not in b_s:
            assert a_s == b_s, f"{where}: int {a_s} != {b_s}"
            continue
        a, b = float(a_s), float(b_s)
        decimals = len(a_s.split(".")[1]) if "." in a_s else 0
        # both sides print rounded values: allow 2 ulps of the printed
        # precision plus a small relative term for genuine compute drift
        # (engine mx-FFT vs module path)
        tol = 2.0 * 10.0 ** (-decimals) + 2e-3 * abs(a)
        assert abs(a - b) <= tol, f"{where}: {a_s} vs {b_s} (tol {tol:.3g})"


def _match_block(engine_block: str, module_text: str, skip_skeletons: Tuple[str, ...] = ()):
    """
    Every numeric engine line must find (in order) a module line with the
    same skeleton; numbers must agree. Module-only extra lines are allowed.
    """
    module_lines = [l for l in module_text.splitlines()]
    cursor = 0
    matched = 0
    for line in engine_block.splitlines():
        skel, tokens = _skeleton_and_numbers(line)
        if not tokens or not line.strip():
            continue
        if skel in skip_skeletons:
            continue
        found = None
        for j in range(cursor, len(module_lines)):
            m_skel, m_tokens = _skeleton_and_numbers(module_lines[j])
            if m_skel == skel:
                found = (j, m_tokens)
                break
        assert found is not None, (
            f"engine line has no module counterpart:\n  {line!r}\n"
            f"module text:\n{module_text}"
        )
        cursor = found[0] + 1
        _assert_numbers_close(tokens, found[1], where=line)
        matched += 1
    assert matched > 0, f"no numeric lines matched in block:\n{engine_block}"
    return matched


@pytest.fixture(scope="module")
def ir_wav(tmp_path_factory, synthetic_ir):
    from audio_analysis_tpu.io.wav import write_wav_pcm16

    ir, sr, _, _ = synthetic_ir
    path = tmp_path_factory.mktemp("summaries") / "ir.wav"
    write_wav_pcm16(path, ir.T, sr)
    return Path(path), sr


@pytest.fixture(scope="module")
def engine_sections(ir_wav):
    """format_tap_summary on the WAV, split into {'Decay / EDC': block, ...}."""
    import jax.numpy as jnp

    from audio_analysis_tpu.engine import EngineConfig
    from audio_analysis_tpu.engine.batch import analyze_bundle
    from audio_analysis_tpu.io.wav import load_wav_file
    from audio_analysis_tpu.report.engine_report import format_tap_summary

    path, sr = ir_wav
    loaded = load_wav_file(path, sr, "stereo")
    batch = np.ascontiguousarray(loaded.samples.T)[None]  # (1, 2, N)
    lengths = np.array([batch.shape[-1]], np.int32)

    config = EngineConfig()
    out = analyze_bundle(batch, lengths, config, chunk_taps=1)
    text = format_tap_summary(out, 0, ["left", "right"], sr, config)

    sections = {}
    for part in text.split("## ")[1:]:
        title, _, body = part.partition("\n")
        sections[title.strip()] = body
    return sections


def test_engine_blocks_present(engine_sections):
    assert {
        "Impulse response",
        "Decay / EDC",
        "RT60 by band",
        "Frequency response",
        "Group delay",
        "Spectrogram",
        "Waterfall",
        "Diffusion / echo density proxy",
        "Modal cloud",
    } <= set(engine_sections)


def test_decay_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.decay import (
        DecayAnalysisSettings,
        analyse_decay_from_wav_file,
        summarise_decay_results_text,
    )

    results = analyse_decay_from_wav_file(ir_wav[0], DecayAnalysisSettings(compute_edt=True))
    _match_block(engine_sections["Decay / EDC"], summarise_decay_results_text(results))


def test_bands_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.rt60bands import (
        Rt60BandsAnalysisSettings,
        analyse_rt60_bands_from_wav_file,
        summarise_rt60_bands_results_text,
    )

    results = analyse_rt60_bands_from_wav_file(ir_wav[0], Rt60BandsAnalysisSettings())
    text = summarise_rt60_bands_results_text(results, include_t20=False, include_edt=False)
    _match_block(engine_sections["RT60 by band"], text)


def test_fr_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.frequency_response import (
        FrequencyResponseAnalysisSettings,
        analyse_frequency_response_from_wav_file,
        summarise_frequency_response_results_text,
    )

    results = analyse_frequency_response_from_wav_file(
        ir_wav[0], FrequencyResponseAnalysisSettings()
    )
    _match_block(
        engine_sections["Frequency response"],
        summarise_frequency_response_results_text(results),
    )


def test_group_delay_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.group_delay import (
        GroupDelayAnalysisSettings,
        analyse_group_delay_from_wav_file,
        summarise_group_delay_results_text,
    )

    results = analyse_group_delay_from_wav_file(ir_wav[0], GroupDelayAnalysisSettings())
    _match_block(
        engine_sections["Group delay"], summarise_group_delay_results_text(results)
    )


def test_spectrogram_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.spectrogram import (
        SpectrogramAnalysisSettings,
        analyse_spectrogram_from_wav_file,
        summarise_spectrogram_results_text,
    )

    results = analyse_spectrogram_from_wav_file(ir_wav[0], SpectrogramAnalysisSettings())
    _match_block(
        engine_sections["Spectrogram"], summarise_spectrogram_results_text(results)
    )


def test_waterfall_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.waterfall import (
        WaterfallAnalysisSettings,
        analyse_waterfall_from_wav_file,
        summarise_waterfall_results_text,
    )

    results = analyse_waterfall_from_wav_file(ir_wav[0], WaterfallAnalysisSettings())
    _match_block(
        engine_sections["Waterfall"], summarise_waterfall_results_text(results)
    )


def test_diffusion_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.diffusion import (
        DiffusionAnalysisSettings,
        analyse_diffusion_from_wav_file,
        summarise_diffusion_results_text,
    )

    # module defaults differ from the report/engine defaults — align them
    # (EngineConfig mirrors report.py:360-361)
    results = analyse_diffusion_from_wav_file(
        ir_wav[0], DiffusionAnalysisSettings(hop_seconds=0.05, max_lag_milliseconds=5.0)
    )
    # stereo corr0/iacc come from the engine's stereo block; the per-channel
    # module path doesn't compute them (covered by
    # tests/test_engine_and_sharding.py's diffusion cross-validation)
    _match_block(
        engine_sections["Diffusion / echo density proxy"],
        summarise_diffusion_results_text(results),
        skip_skeletons=("  median_corr0=#", "  median_iacc_max=#"),
    )


def test_modal_summary_matches_module(engine_sections, ir_wav):
    from audio_analysis_tpu.analyses.modalcloud import (
        ModalCloudAnalysisSettings,
        analyse_modal_cloud_from_wav_file,
        summarise_modal_cloud_results_text,
    )

    results = analyse_modal_cloud_from_wav_file(ir_wav[0], ModalCloudAnalysisSettings())
    _match_block(
        engine_sections["Modal cloud"], summarise_modal_cloud_results_text(results)
    )
