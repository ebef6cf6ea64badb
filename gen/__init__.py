"""Drop-in compatibility shim for the reference's `gen` package.

`python -m gen.cli ...`, `from gen.signals import ...` AND the package's
own re-exports (`from gen import generate_noise_burst`, reference
gen/__init__.py:30-43) work unchanged; everything is implemented by
audio_analysis_tpu.
"""

from audio_analysis_tpu.signals import (  # noqa: F401
    GeneratedSignal,
    duplicate_mono_to_stereo,
    generate_click,
    generate_impulse,
    generate_impulse_train,
    generate_karplus_strong_pluck,
    generate_log_sine_sweep,
    generate_noise,
    generate_noise_burst,
    generate_pluck_like,
    generate_sine,
    generate_sine_burst,
)

__all__ = [
    "GeneratedSignal",
    "duplicate_mono_to_stereo",
    "generate_click",
    "generate_impulse",
    "generate_impulse_train",
    "generate_karplus_strong_pluck",
    "generate_log_sine_sweep",
    "generate_noise",
    "generate_noise_burst",
    "generate_pluck_like",
    "generate_sine",
    "generate_sine_burst",
]
