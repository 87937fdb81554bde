"""TV-L1 optical flow (ops/optical_flow.py) and the legacy tracker's use_piv
branch (reference tissue_info.py:2061-2071)."""
import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from tissue_image_processing_tpu.ops.optical_flow import (
    optical_flow_tvl1, warp_bilinear)
from tissue_image_processing_tpu.core.tracking import track_movie_nearest_pixel


def _texture(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return ndi.gaussian_filter(rng.random((h, w)), 2.0).astype(np.float32)


def test_warp_bilinear_integer_shift():
    img = _texture(32, 32)
    u = jnp.full((32, 32), 3.0)
    v = jnp.full((32, 32), -2.0)
    got = np.asarray(warp_bilinear(jnp.asarray(img), u, v))
    # interior must equal img[y+3, x-2]
    np.testing.assert_allclose(got[2:-4, 3:-1], img[5:-1, 1:-3], atol=1e-6)


def test_tvl1_recovers_uniform_translation():
    # 192x192 like the tracker test below: the two tests share ONE jit cache
    # entry (the pyramid program compiles slowly on the CPU test backend)
    img = _texture(192, 192, seed=1)
    s = (4, -3)
    mov = np.roll(img, s, axis=(0, 1))
    flow = np.asarray(optical_flow_tvl1(jnp.asarray(img), jnp.asarray(mov)))
    # interior flow ~= the shift (roll wraps at edges; ignore a margin)
    m = 16
    assert abs(np.median(flow[0, m:-m, m:-m]) - s[0]) < 0.5, flow[0].mean()
    assert abs(np.median(flow[1, m:-m, m:-m]) - s[1]) < 0.5, flow[1].mean()


def _voronoi_movie(h=192, w=192, n=120, amp=12.0, seed=0):
    """Two frames whose cells move by a NONUNIFORM field d(y,x) =
    (amp*sin(2*pi*x/w), 0): net zero global drift, large local motion."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(0, h, n), rng.uniform(0, w, n)], 1)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def labels_from(points):
        d2 = ((yy[..., None] - points[:, 0]) ** 2
              + (xx[..., None] - points[:, 1]) ** 2)
        return d2.argmin(-1) + 1

    lab1 = labels_from(pts)
    # frame-2: every seed moves by d(seed)
    dy = amp * np.sin(2 * np.pi * pts[:, 1] / w)
    pts2 = pts + np.stack([dy, np.zeros(n)], 1)
    lab2 = labels_from(pts2)

    def img_from(lab):
        edge = (np.abs(np.diff(lab, axis=0, prepend=lab[:1])) > 0) | \
               (np.abs(np.diff(lab, axis=1, prepend=lab[:, :1])) > 0)
        return ndi.gaussian_filter(edge.astype(np.float32), 1.5)

    def table(lab):
        # a seed whose Voronoi region vanishes (occluded by a mover) gets NaN
        cy = np.full(n, np.nan)
        cx = np.full(n, np.nan)
        for k in range(1, n + 1):
            ys, xs = np.nonzero(lab == k)
            if ys.size:
                cy[k - 1], cx[k - 1] = ys.mean(), xs.mean()
        return cy, cx

    cy1, cx1 = table(lab1)
    cy2, cx2 = table(lab2)
    labels = np.stack([lab1, lab2])
    images = np.stack([img_from(lab1), img_from(lab2)])
    return (labels, images, np.stack([cy1, cy2]), np.stack([cx1, cx2]),
            np.ones((2, n), bool))


def test_flow_tracker_recovers_nonuniform_drift():
    """VERDICT r2 item 5: nonuniform synthetic drift breaks the global-drift
    tracker but the optical-flow variant recovers >= 95% of links."""
    labels, images, cy, cx, mask = _voronoi_movie()

    valid = ~np.isnan(cy).any(0)  # cells present in both frames
    mask = mask & ~np.isnan(cy)
    cy = np.nan_to_num(cy)
    cx = np.nan_to_num(cx)
    ids_global = track_movie_nearest_pixel(labels, cy, cx, mask)
    ids_flow = track_movie_nearest_pixel(labels, cy, cx, mask,
                                         images=images, use_flow=True)
    # true correspondence: row k in both frames is the same cell
    rec_global = (ids_global[1][valid] == ids_global[0][valid]).mean()
    rec_flow = (ids_flow[1][valid] == ids_flow[0][valid]).mean()
    assert rec_flow >= 0.95, f"flow recovery {rec_flow:.3f}"
    assert rec_global < 0.80, (
        f"global tracker unexpectedly fine ({rec_global:.3f}); "
        "the synthetic drift is not hard enough")
    assert rec_flow > rec_global
