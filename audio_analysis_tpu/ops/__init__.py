"""
The batched kernel library — every DSP primitive of the framework, once.

trim      peak alignment + validity masks (replaces data-dependent slicing)
edc       Schroeder energy decay curve
dbfit     interpolated dB crossings + masked least-squares decay fits
stft      the single shared STFT magnitude kernel
fftmask   raised-cosine FFT filterbank (all bands in one batched irfft)
logfreq   log-frequency smoothing / binning (modal cloud aggregation matmul)
spectral  magnitude/phase spectra, group delay, deconvolution, AR fit
diffusion sliding-window autocorr / echo density / corr0 / IACC via FFT
"""

import os as _os

import jax as _jax


def _enable_persistent_compilation_cache() -> None:
    """Reuse compiled programs across processes (TPU compiles are slow)."""
    cache_dir = _os.environ.get(
        "AA_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/aa_tpu_xla")
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax versions
        pass


_enable_persistent_compilation_cache()

from audio_analysis_tpu.ops import common, dbfit, diffusion, edc, fftmask, logfreq, spectral, stft, trim  # noqa: F401,E402
