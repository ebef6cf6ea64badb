"""
Tight-bbox cache (plot._save_tight): repeat figure layouts skip savefig's
tight layout pass. The cached crop must be BYTE-identical to the plain
`bbox_inches="tight"` output on both the miss and hit paths (2D and 3D),
keys must separate layouts that crop differently, and unfingerprintable
figures must fall back to the plain tight path.
"""

import numpy as np
import pytest

import audio_analysis_tpu.plot as P
from audio_analysis_tpu.plot import create_figure_and_axis, finalize_and_show_or_save


@pytest.fixture(autouse=True)
def fresh_cache():
    old = P.TIGHT_BBOX_CACHE_ENABLED
    P.TIGHT_BBOX_CACHE_ENABLED = True
    P.clear_tight_bbox_cache()
    yield
    P.TIGHT_BBOX_CACHE_ENABLED = old
    P.clear_tight_bbox_cache()


def _render(path, data, ylim=(-3.0, 3.0), title="Decay  tap.wav"):
    fig, ax = create_figure_and_axis(title, figure_size=(4.0, 2.5))
    ax.plot(np.arange(len(data)), data, label="EDC")
    ax.legend(loc="best")
    ax.set_xlabel("Time (seconds)")
    ax.set_ylabel("Level (dB)")
    ax.set_ylim(*ylim)
    finalize_and_show_or_save(fig, path, False)
    return path.read_bytes()


def test_hit_and_miss_paths_byte_identical_to_tight(tmp_path):
    rng = np.random.default_rng(0)
    d1, d2 = rng.standard_normal(200), rng.standard_normal(200)

    P.TIGHT_BBOX_CACHE_ENABLED = False
    ref1 = _render(tmp_path / "r1.png", d1)
    ref2 = _render(tmp_path / "r2.png", d2)

    P.TIGHT_BBOX_CACHE_ENABLED = True
    P.clear_tight_bbox_cache()
    got1 = _render(tmp_path / "c1.png", d1)  # miss: computes + stores bbox
    assert len(P._TIGHT_BBOX_CACHE) == 1
    got2 = _render(tmp_path / "c2.png", d2)  # same layout, new data: hit
    assert len(P._TIGHT_BBOX_CACHE) == 1
    assert got1 == ref1
    assert got2 == ref2


def test_layout_changes_get_distinct_keys(tmp_path):
    d = np.linspace(-1.0, 1.0, 50)
    _render(tmp_path / "a.png", d, ylim=(-3.0, 3.0))
    _render(tmp_path / "b.png", d, ylim=(-300.0, 3.0))  # wider tick labels
    # titles are volatile (unioned at save time), NOT part of the key
    _render(tmp_path / "c.png", d, title="Other title")
    assert len(P._TIGHT_BBOX_CACHE) == 2

    # wider-label figure must not reuse the narrow-label crop
    P.TIGHT_BBOX_CACHE_ENABLED = False
    ref = _render(tmp_path / "b_ref.png", d, ylim=(-300.0, 3.0))
    assert (tmp_path / "b.png").read_bytes() == ref


def _render_3d(path, seed, elev=30.0, azim=-60.0, zlim=(-80.0, 2.0)):
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    f = np.logspace(np.log10(20.0), np.log10(20000.0), 64)
    t = np.linspace(0.0, 2.0, 12)
    mesh_x, mesh_y = np.meshgrid(np.log10(f), t)
    z = -40.0 * mesh_y + rng.normal(0.0, 3.0, mesh_x.shape)
    fig = plt.figure(figsize=(4.0, 2.5))
    ax = fig.add_subplot(projection="3d")
    ax.plot_surface(mesh_x, mesh_y, z, cmap="viridis", edgecolor="none")
    ax.set_xlabel("Frequency (Hz)")
    ax.set_ylabel("Time (s)")
    ax.set_zlabel("Magnitude (dB rel)")
    ax.set_zlim(*zlim)
    ax.view_init(elev=elev, azim=azim)
    finalize_and_show_or_save(fig, path, False)
    return path.read_bytes()


def test_3d_hit_byte_identical_and_view_changes_get_new_keys(tmp_path):
    P.TIGHT_BBOX_CACHE_ENABLED = False
    ref1 = _render_3d(tmp_path / "r1.png", seed=1)
    ref2 = _render_3d(tmp_path / "r2.png", seed=2)  # same layout, new data

    P.TIGHT_BBOX_CACHE_ENABLED = True
    P.clear_tight_bbox_cache()
    got1 = _render_3d(tmp_path / "c1.png", seed=1)  # miss
    assert len(P._TIGHT_BBOX_CACHE) == 1
    got2 = _render_3d(tmp_path / "c2.png", seed=2)  # hit
    assert len(P._TIGHT_BBOX_CACHE) == 1
    assert got1 == ref1
    assert got2 == ref2

    # a different view projects ticks differently -> distinct key AND a
    # crop that still matches the uncached output
    got3 = _render_3d(tmp_path / "c3.png", seed=1, elev=60.0)
    assert len(P._TIGHT_BBOX_CACHE) == 2
    P.TIGHT_BBOX_CACHE_ENABLED = False
    assert got3 == _render_3d(tmp_path / "r3.png", seed=1, elev=60.0)


def test_per_tap_titles_share_one_entry(tmp_path):
    """Bundle taps differ only in the title (the input path): they must
    share ONE stable cache entry, and every hit render — including a title
    wide enough to move the crop — must still match the uncached output
    byte for byte (the save-time union re-measures the current texts)."""
    d = np.linspace(-1.0, 1.0, 50)

    titles = (
        "Spectrogram tap00.wav",
        "Spectrogram tap17.wav",
        "Spectrogram " + "a_much_longer_tap_name" * 4 + ".wav",  # crop-moving
    )
    P.TIGHT_BBOX_CACHE_ENABLED = False
    refs = [
        _render(tmp_path / f"r{i}.png", d, title=t) for i, t in enumerate(titles)
    ]

    P.TIGHT_BBOX_CACHE_ENABLED = True
    P.clear_tight_bbox_cache()
    gots = [
        _render(tmp_path / f"c{i}.png", d, title=t) for i, t in enumerate(titles)
    ]
    assert len(P._TIGHT_BBOX_CACHE) == 1  # titles are volatile, one stable key
    for got, ref in zip(gots, refs):
        assert got == ref
    # the wide title must actually have produced a different (wider) crop
    assert refs[2] != refs[0]


def test_oversized_legend_falls_back_to_plain_tight(tmp_path):
    """A legend whose labels could overflow the axes frame must NOT reuse a
    cached stable crop (the legend is excluded from the volatile-text
    union) — the key builder bails and the output still matches plain
    tight byte for byte."""
    d = np.linspace(-1.0, 1.0, 50)

    def render_with_labels(path, labels):
        fig, ax = create_figure_and_axis("T", figure_size=(4.0, 2.5))
        for i, lab in enumerate(labels):
            ax.plot(np.arange(50), d + i, label=lab)
        ax.legend(loc="best")
        finalize_and_show_or_save(fig, path, False)
        return path.read_bytes()

    long_labels = ["X" * 120, "Y" * 120]
    P.TIGHT_BBOX_CACHE_ENABLED = False
    ref = render_with_labels(tmp_path / "ref.png", long_labels)

    P.TIGHT_BBOX_CACHE_ENABLED = True
    P.clear_tight_bbox_cache()
    got = render_with_labels(tmp_path / "got.png", long_labels)
    assert len(P._TIGHT_BBOX_CACHE) == 0  # guard bailed: nothing cached
    assert got == ref

    # ordinary labels still cache
    render_with_labels(tmp_path / "ok.png", ["left", "right"])
    assert len(P._TIGHT_BBOX_CACHE) == 1
