"""Generate the committed golden fixtures (run once; outputs are committed).

Two independent oracles produce the expected outputs (SURVEY §4: skimage /
trackpy are absent from this environment, so the C++ Meyer flood
(``native/watershed.cpp``) and the exact Crocker-Grier linker
(``tests/oracles.py``) stand in — both are independent implementations of the
algorithms the reference delegates to scipy/skimage/trackpy):

- ``watershed_<HxW>.npz``: blurred membrane surface (float32) + the native
  Meyer flood labels (int32) at three shapes incl. an unaligned one that
  exercises the pad-and-crop Pallas gate.
- ``tracking_movie.npz``: a 100-frame centroid-table movie with drift,
  divisions and exits + the Crocker-Grier track ids.

Usage: python tests/fixtures/generate.py  (from the repo root)
"""
import os
import sys

import numpy as np
from scipy import ndimage as ndi

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))          # tests/ (oracles)
sys.path.insert(0, os.path.join(HERE, "..", ".."))    # repo root (the package)


def membrane_surface(h, w, n_seeds, seed):
    """Thresholded + blurred membrane image — the exact watershed input the
    product path produces (ops/watershed.py:watershed_segmentation pre-stage)."""
    r = np.random.default_rng(seed)
    pts = np.stack([r.uniform(0, h, n_seeds), r.uniform(0, w, n_seeds)], axis=1)
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2)
    d.sort(axis=-1)
    ridge = np.exp(-((d[..., 1] - d[..., 0]) ** 2) / (2 * 2.0 ** 2))
    img = np.clip(ridge + 0.02 * r.standard_normal((h, w)), 0, None) * 60000
    seg = np.where(img < 0.2 * img.max(), 0.0, img)
    return ndi.gaussian_filter(seg.astype(np.float32), 3.0)


def gen_watershed():
    from tissue_image_processing_tpu.native import (meyer_watershed_native,
                                                    native_available)
    assert native_available(), "build the native oracle first"
    for (h, w, n) in [(128, 128, 20), (150, 170, 28), (512, 512, 140)]:
        surf = membrane_surface(h, w, n, seed=h + w)
        labels = meyer_watershed_native(surf)
        path = os.path.join(HERE, f"watershed_{h}x{w}.npz")
        np.savez_compressed(path, surface=surf, labels=labels.astype(np.int32))
        print(f"{path}: {labels.max()} cells, {os.path.getsize(path)//1024} KiB")


def gen_tracking(T=100, H=1000.0, W=1000.0, n0=220, seed=7):
    """Random-walking cells under a global drift; ~10 divisions and ~10 exits
    spread over the movie (the event mix the reference's lineage logic sees)."""
    from oracles import crocker_grier_link

    rng = np.random.default_rng(seed)
    cy = list(rng.uniform(50, H - 50, n0))
    cx = list(rng.uniform(50, W - 50, n0))
    area = list(rng.uniform(1200, 2000, n0))
    alive = [True] * n0
    drift = np.stack([1.5 * np.ones(T), -1.0 * np.ones(T)], 1)
    frames = []
    for t in range(T):
        ids_now = [i for i in range(len(cy)) if alive[i]]
        fy = np.array([cy[i] for i in ids_now])
        fx = np.array([cx[i] for i in ids_now])
        fa = np.array([area[i] for i in ids_now])
        frames.append((fy.copy(), fx.copy(), fa.copy()))
        # advance: drift + brownian jitter + slow area drift
        for i in ids_now:
            cy[i] += drift[t, 0] + rng.normal(0, 1.2)
            cx[i] += drift[t, 1] + rng.normal(0, 1.2)
            area[i] = float(np.clip(area[i] * rng.normal(1.0, 0.01), 800, 2600))
        # events: one division / one exit every ~10 frames
        if t % 10 == 4 and ids_now:
            parent = int(rng.choice(ids_now))
            alive[parent] = False
            for s in (-1, 1):
                cy.append(cy[parent] + s * rng.uniform(8, 14))
                cx.append(cx[parent] + rng.uniform(-5, 5))
                area.append(area[parent] * 0.55)
                alive.append(True)
        if t % 10 == 9 and len(ids_now) > 40:
            gone = int(rng.choice(ids_now))
            alive[gone] = False

    ids = crocker_grier_link(frames)
    N = max(len(f[0]) for f in frames)
    out = {k: np.zeros((T, N), np.float64) for k in ("cy", "cx", "area")}
    mask = np.zeros((T, N), bool)
    track = np.zeros((T, N), np.int64)
    for t, (fy, fx, fa) in enumerate(frames):
        k = len(fy)
        out["cy"][t, :k] = fy
        out["cx"][t, :k] = fx
        out["area"][t, :k] = fa
        mask[t, :k] = True
        track[t, :k] = ids[t]
    path = os.path.join(HERE, "tracking_movie.npz")
    np.savez_compressed(path, **out, mask=mask, track_ids=track, drift=drift)
    print(f"{path}: T={T} N={N}, {os.path.getsize(path)//1024} KiB")


if __name__ == "__main__":
    gen_watershed()
    gen_tracking()
