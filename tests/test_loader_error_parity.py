"""
Live cross-tool parity for the WAV loader's ERROR contract.

The reference's validation errors are explicit, user-facing messages
(io.py:156-178); this framework reproduces them verbatim. Each invalid
input runs through BOTH loaders (the reference in a subprocess, its own
sys.path) and the exception type + message must match byte for byte.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

REFERENCE = "/root/reference"

CASES = {
    "wrong_sample_rate": dict(sr=44_100, shape=(1000,), kwargs={}),
    "three_channels": dict(sr=48_000, shape=(1000, 3), kwargs={}),
    "stereo_when_mono_expected": dict(
        sr=48_000, shape=(1000, 2), kwargs={"expected_channel_mode": "mono"}
    ),
    "mono_when_stereo_expected_no_upmix": dict(
        sr=48_000, shape=(1000,), kwargs={
            "expected_channel_mode": "stereo",
            "allow_mono_and_upmix_to_stereo": False,
        }
    ),
}

_PROBE = """
import json, sys
from analyse.io import load_wav_file
path, kwargs = sys.argv[1], json.loads(sys.argv[2])
try:
    load_wav_file(path, **kwargs)
    print(json.dumps(["none", ""]))
except Exception as e:
    print(json.dumps([type(e).__name__, str(e)]))
"""


@pytest.fixture(scope="module")
def case_wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("loader_errors")
    paths = {}
    for name, case in CASES.items():
        path = root / f"{name}.wav"
        wavfile.write(str(path), case["sr"], np.zeros(case["shape"], np.int16))
        paths[name] = str(path)
    return paths


@pytest.mark.parametrize("name", sorted(CASES))
def test_loader_error_matches_reference(name, case_wavs):
    if not Path(REFERENCE, "analyse", "io.py").exists():
        pytest.skip("reference tree not mounted")
    case = CASES[name]

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = REFERENCE
    ref = json.loads(
        subprocess.run(
            [sys.executable, "-c", _PROBE, case_wavs[name], json.dumps(case["kwargs"])],
            env=env, capture_output=True, text=True, check=True, timeout=120,
            cwd=os.path.dirname(case_wavs[name]),  # neutral cwd: no repo shims
        ).stdout
    )
    assert ref[0] == "ValueError", f"reference did not reject {name}: {ref}"

    from analyse.io import load_wav_file  # this repo's shim -> our loader

    with pytest.raises(ValueError) as exc:
        load_wav_file(case_wavs[name], **case["kwargs"])
    assert str(exc.value) == ref[1], (
        f"{name}: error message drifted from the reference tool"
    )
