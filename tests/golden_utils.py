"""Deterministic golden-report fixtures: input synthesis + md comparison."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

SR = 48_000
GOLDEN_DIR = Path(__file__).parent / "golden"

_NUM = re.compile(r"-?\d+\.\d+")


def make_golden_ir() -> np.ndarray:
    """The frozen golden input: 1.365 s stereo IR, RT60 0.8 s, onset 480."""
    n = 1 << 16
    rng = np.random.default_rng(20260816)
    t = np.arange(n) / SR
    env = 10.0 ** (-3.0 * t / 0.8)
    ir = np.zeros((n, 2), np.float32)
    ir[480:, 0] = (0.05 * rng.standard_normal(n - 480) * env[: n - 480]).astype(np.float32)
    ir[480:, 1] = (0.05 * rng.standard_normal(n - 480) * env[: n - 480]).astype(np.float32)
    ir[480, :] = 0.9
    return ir


def skeleton_and_numbers(md: str) -> Tuple[List[str], List[float]]:
    """
    Split a report md into (structural skeleton, numeric values).
    The skeleton is every line with its decimal numbers replaced by '#'
    (paths and timing table excluded); values are the extracted decimals.
    """
    skeleton: List[str] = []
    numbers: List[float] = []
    in_timing = False
    for line in md.splitlines():
        if line.startswith("## Timing"):
            in_timing = True
            continue
        if in_timing:
            if line.startswith("## "):
                in_timing = False
            else:
                continue
        if "**Input WAV:**" in line or line.startswith("!["):
            # paths vary per run; images checked by suffix set elsewhere
            skeleton.append(re.sub(r"\(.*\)|`.*`", "(_)", line))
            continue
        numbers.extend(float(v) for v in _NUM.findall(line))
        skeleton.append(_NUM.sub("#", line))
    return skeleton, numbers


def compare_reports(golden_md: str, fresh_md: str, rel_tol: float = 0.05, abs_tol: float = 0.02):
    """Assert same structure and numerically close values."""
    g_skel, g_nums = skeleton_and_numbers(golden_md)
    f_skel, f_nums = skeleton_and_numbers(fresh_md)
    assert g_skel == f_skel, "report structure drifted"
    assert len(g_nums) == len(f_nums)
    for i, (a, b) in enumerate(zip(g_nums, f_nums)):
        scale = max(abs(a), abs(b))
        assert abs(a - b) <= max(abs_tol, rel_tol * scale), (
            f"value {i} drifted: golden={a} fresh={b}\n"
            f"context: {[l for l in g_skel if '#' in l][:3]}"
        )
