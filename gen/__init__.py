"""Drop-in compatibility shim for the reference's `gen` package.

`python -m gen.cli ...` and `from gen.signals import ...` work unchanged;
everything is implemented by audio_analysis_tpu.
"""
