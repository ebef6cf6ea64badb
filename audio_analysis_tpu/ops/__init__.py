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

from audio_analysis_tpu.ops import common, dbfit, diffusion, edc, fftmask, logfreq, spectral, stft, trim  # noqa: F401
