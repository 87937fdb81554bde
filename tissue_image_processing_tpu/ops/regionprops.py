"""Region properties via segment reductions.

TPU-native replacement for ``skimage.measure.regionprops_table(labels,
properties=['label','area','perimeter','centroid','bbox'])`` (reference
``tissue_info.py:891``, ``:2353``): one flattened pass of segment_sum/min/max over the
label map produces every per-cell property as a padded vector indexed by label.

Perimeter matches skimage's weighted-border-pattern estimator (Benkrid/Crookes
weights): border pixels (4-neighbor erosion against the region's own mask,
out-of-image = background) are coded by how many same-region border pixels surround
them (4-neighbors weight 2, diagonals weight 10, self 1) and the code is mapped through
the standard weight table {5,7,15,17,25,27 -> 1; 21,33 -> sqrt(2); 13,23 -> (1+sqrt2)/2}.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tissue_image_processing_tpu.ops.morphology import shift2d

__all__ = ["regionprops", "perimeter_map"]

_NBRS4 = [(1, 0), (-1, 0), (0, 1), (0, -1)]
_DIAG4 = [(1, 1), (1, -1), (-1, 1), (-1, -1)]


def _perimeter_weight_table() -> jnp.ndarray:
    w = jnp.zeros((50,), jnp.float32)
    w = w.at[jnp.array([5, 7, 15, 17, 25, 27])].set(1.0)
    w = w.at[jnp.array([21, 33])].set(jnp.sqrt(2.0))
    w = w.at[jnp.array([13, 23])].set((1.0 + jnp.sqrt(2.0)) / 2.0)
    return w


@jax.jit
def perimeter_map(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel perimeter contribution; segment-sum by label gives each region's
    skimage-compatible perimeter."""
    lab = labels.astype(jnp.int32)
    fg = lab > 0
    # interior: all 4-neighbors share the label (out-of-image counts as background)
    interior = fg
    for dy, dx in _NBRS4:
        same = shift2d(lab, -dy, -dx, -1) == lab
        interior = interior & same
    border = fg & (~interior)
    code = border.astype(jnp.int32)  # center weight 1
    for dy, dx in _NBRS4:
        nb = shift2d(border & fg, -dy, -dx, False) & (shift2d(lab, -dy, -dx, -1) == lab)
        code = code + 2 * nb.astype(jnp.int32)
    for dy, dx in _DIAG4:
        nb = shift2d(border, -dy, -dx, False) & (shift2d(lab, -dy, -dx, -1) == lab)
        code = code + 10 * nb.astype(jnp.int32)
    code = jnp.where(border, code, 0)
    table = _perimeter_weight_table()
    return table[jnp.clip(code, 0, 49)]


@functools.partial(jax.jit, static_argnames=("num_labels",))
def regionprops(
    labels: jnp.ndarray,
    num_labels: int,
    intensity: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute per-label properties.

    Args:
      labels: (H, W) int map, 0 = background/boundary, cells 1..N.
      num_labels: static capacity N (arrays are sized N+1; index = label; slot 0 unused).
      intensity: optional (H, W) image for mean intensity.

    Returns a dict of (num_labels+1,)-shaped arrays: area, cy, cx, perimeter,
    bbox_min_row, bbox_min_col, bbox_max_row, bbox_max_col (max-exclusive like
    skimage), exists (bool), and mean_intensity if requested.

    Implementation: one stable sort groups pixels by label in raster order; sums come
    from cumulative-sum differences at segment boundaries, row extrema from the first
    and last pixel of each run, column extrema from a second (label, col)-keyed sort —
    all gathers and scans, no TPU scatters (an equivalent segment_sum build spent
    ~10 ms per scattered property at 1024^2).
    """
    H, W = labels.shape
    n = H * W
    lab = labels.astype(jnp.int32).ravel()
    ns = num_labels + 1
    order = jnp.argsort(lab, stable=True)
    slab = lab[order]
    seg_ids = jnp.arange(ns, dtype=jnp.int32)
    starts = jnp.searchsorted(slab, seg_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(slab, seg_ids, side="right").astype(jnp.int32)
    counts = ends - starts
    area = counts.astype(jnp.float32)

    ys_i = (jnp.arange(n, dtype=jnp.int32) // W)
    xs_i = (jnp.arange(n, dtype=jnp.int32) % W)

    # start-of-run flags for segmented scans (a plain cumsum difference would
    # subtract two ~1e9 prefixes in f32 and lose ~0.03 px of centroid at 1024^2)
    run_start = jnp.concatenate([jnp.ones((1,), bool), slab[1:] != slab[:-1]])

    def seg_sum(values):
        sv = values[order].astype(jnp.float32)

        def op(a, b):
            a_flag, a_val = a
            b_flag, b_val = b
            return a_flag | b_flag, b_val + jnp.where(b_flag, 0.0, a_val)

        _, run_sums = jax.lax.associative_scan(op, (run_start, sv))
        last = jnp.clip(ends - 1, 0, n - 1)
        return jnp.where(counts > 0, run_sums[last], 0.0)

    sy = seg_sum(ys_i)
    sx = seg_sum(xs_i)
    safe_area = jnp.maximum(area, 1.0)
    cy = sy / safe_area
    cx = sx / safe_area
    # stable sort keeps raster order inside each label run: first/last pixel give
    # the row extrema
    sorted_ys = ys_i[order]
    last = jnp.clip(ends - 1, 0, n - 1)
    first = jnp.clip(starts, 0, n - 1)
    bbox_min_row = sorted_ys[first]
    bbox_max_row = sorted_ys[last] + 1
    # column extrema via a (label, col) lexicographic sort
    key = lab * W + xs_i
    order2 = jnp.argsort(key)
    sorted_xs = xs_i[order2]
    bbox_min_col = sorted_xs[first]
    bbox_max_col = sorted_xs[last] + 1
    perim = seg_sum(perimeter_map(labels).ravel())
    exists = counts > 0
    bbox_min_row = jnp.where(exists, bbox_min_row, 0)
    bbox_min_col = jnp.where(exists, bbox_min_col, 0)
    bbox_max_row = jnp.where(exists, bbox_max_row, 0)
    bbox_max_col = jnp.where(exists, bbox_max_col, 0)
    out = {
        "area": area,
        "cy": cy,
        "cx": cx,
        "perimeter": perim,
        "bbox_min_row": bbox_min_row,
        "bbox_min_col": bbox_min_col,
        "bbox_max_row": bbox_max_row,
        "bbox_max_col": bbox_max_col,
        "exists": exists,
    }
    if intensity is not None:
        out["mean_intensity"] = seg_sum(intensity.ravel()) / safe_area
    return out
