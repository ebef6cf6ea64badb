"""Shim: `python -m gen.cli` -> audio_analysis_tpu.cli.gen_cli."""
from audio_analysis_tpu.cli.gen_cli import (  # noqa: F401
    build_parser,
    default_output_filename,
    ensure_wav_suffix,
    generate_signal_from_arguments,
    main,
)
from audio_analysis_tpu.io.wav import write_wav_pcm16 as _write_wav_pcm16
from pathlib import Path as _Path
import numpy as _np

DEFAULT_SAMPLE_RATE_HZ = 48_000


def write_wav_file_pcm16(output_file_path, samples_float32, sample_rate_hz):
    _write_wav_pcm16(_Path(output_file_path), _np.asarray(samples_float32), int(sample_rate_hz))


if __name__ == "__main__":
    main()
