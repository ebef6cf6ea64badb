"""
ops/display: device-side display pooling must reproduce the host pooling
math exactly — log-row max pooling matches plot.log_frequency_image, the
colour percentiles match np.percentile, and slice extraction matches plain
indexing (all up to the shared 1/128-dB fetch quantisation, which is
applied identically on both paths here by quantising the host reference).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audio_analysis_tpu.ops import display  # noqa: E402
from audio_analysis_tpu.plot import log_frequency_image  # noqa: E402


def _q(x):
    """The int16 fixed-point both paths apply before the link — THE shared
    helper pair, so this test can never drift from the production format."""
    return display.dequantize_db_i16(display.quantize_db_i16(jnp.asarray(x)))


def _plane(seed, c, t, n_fft):
    rng = np.random.default_rng(seed)
    f = n_fft // 2 + 1
    return rng.uniform(-120.0, 0.0, (c, t, f)).astype(np.float32)


@pytest.mark.parametrize(
    "t,valid",
    [
        (256, (256, 200)),
        (2048, (1500, 2048)),
        # short tap in a big padded bucket: valid width (150) is under the
        # pooling threshold, so NO column pooling even though t=2048 — the
        # padded-T regression halved time resolution here
        (2048, (150, 100)),
    ],
)
def test_pooled_image_matches_host_pooling(t, valid):
    n_fft, sr = 4096, 48_000
    f_min, f_max, rows, cols = 20.0, 20_000.0, 120, 160
    mag = _plane(0, 2, t, n_fft)
    freq = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fmask = (freq >= f_min) & (freq <= f_max)

    images, p995, p5 = display.pooled_log_freq_image(
        jnp.asarray(mag), np.asarray(valid), n_fft, sr, f_min, f_max,
        rows=rows, cols=cols,
    )

    for c in range(2):
        # per-channel bucket width from that channel's OWN valid width —
        # the host algorithm plot.log_frequency_image applies per channel
        tv = valid[c]
        col_pool = -(-tv // cols) if tv > cols + cols // 2 else 1
        sub = mag[c, : valid[c]][:, fmask].T  # (F_sel, T_valid)
        if col_pool > 1:
            nvb = -(-valid[c] // col_pool)
            pad = nvb * col_pool - valid[c]
            padded = np.concatenate(
                [sub, np.full((sub.shape[0], pad), -np.inf, np.float32)], axis=1
            )
            sub = padded.reshape(sub.shape[0], nvb, col_pool).max(axis=2)
        expect, _ = log_frequency_image(
            sub, freq[fmask], f_min, f_max, rows=rows, cols=0
        )
        np.testing.assert_array_equal(images[c], _q(expect))

        vals = mag[c, : valid[c]][:, fmask]
        assert p995[c] == pytest.approx(float(np.percentile(vals, 99.5)), abs=1 / 128)
        assert p5[c] == pytest.approx(float(np.percentile(vals, 5.0)), abs=1 / 128)


def test_frame_slices_match_indexing():
    n_fft, sr = 4096, 48_000
    f_min, f_max = 20.0, 20_000.0
    mag = _plane(1, 2, 300, n_fft)
    freq = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fmask = (freq >= f_min) & (freq <= f_max)

    idx = np.array([[0, 7, 150, 299], [3, 3, 12, 250]], np.int32)
    got = display.stft_frame_slices(jnp.asarray(mag), idx, n_fft, sr, f_min, f_max)
    for c in range(2):
        expect = _q(mag[c][idx[c]][:, fmask])
        np.testing.assert_array_equal(got[c], expect)
