"""Packaging metadata stays consistent with the code it ships.

The wheel itself is built/installed in CI-style smoke runs; these tests pin
the cheap invariants that would silently break an install: version sync,
resolvable console entry points, and the package-local native-library
search path used by pip installs.
"""

import tomllib
from importlib import import_module
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _project():
    with open(REPO / "pyproject.toml", "rb") as fh:
        return tomllib.load(fh)["project"]


def test_version_matches_package():
    import audio_analysis_tpu

    assert _project()["version"] == audio_analysis_tpu.__version__


def test_console_scripts_resolve():
    scripts = _project()["scripts"]
    assert set(scripts) == {"aa-analyse", "aa-gen"}
    for target in scripts.values():
        module, attr = target.split(":")
        assert callable(getattr(import_module(module), attr))


def test_native_candidates_include_packaged_extension():
    from audio_analysis_tpu.io import native

    candidates = native._lib_candidates()
    # repo-local build stays (development checkouts)...
    assert REPO / "cpp" / "build" / "libaudioio.so" in candidates
    # ...and setup.py's Extension target is what the packaged glob matches:
    # a `_audioio*.so` placed directly inside audio_analysis_tpu/.
    pkg_dir = REPO / "audio_analysis_tpu"
    fake = pkg_dir / "_audioio.cpython-312-test.so"
    fake.touch()
    try:
        assert fake in native._lib_candidates()
    finally:
        fake.unlink()


def test_dependencies_match_requirements_txt():
    deps = set(_project()["dependencies"])
    reqs = {
        line.strip()
        for line in (REPO / "requirements.txt").read_text().splitlines()
        if line.strip() and not line.startswith("#")
    }
    assert deps == reqs
