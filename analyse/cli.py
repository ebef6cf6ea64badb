"""Shim: `python -m analyse.cli` -> audio_analysis_tpu.cli.analyse_cli."""
from audio_analysis_tpu.cli.analyse_cli import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
