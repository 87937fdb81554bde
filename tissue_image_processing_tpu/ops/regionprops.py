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

    Implementation: three scatters — one int32 payload scatter-add for
    (count, sum_y, sum_x) (exact: coordinate sums stay under 2^31), one f32 payload
    scatter-add for (perimeter, intensity), and int32 scatter-min/max payloads for
    the bbox. Scatter cost on TPU is dominated by per-scatter index handling
    (~20 ms per scatter at 1M, nearly independent of payload width), so packing
    properties into payloads beats both per-property scatters and the sort-based
    build (two 1M argsorts alone cost ~80 ms).
    """
    H, W = labels.shape
    n = H * W
    lab = labels.astype(jnp.int32).ravel()
    ns = num_labels + 1

    ys_i = (jnp.arange(n, dtype=jnp.int32) // W)
    xs_i = (jnp.arange(n, dtype=jnp.int32) % W)
    ones_i = jnp.ones((n,), jnp.int32)

    isums = jnp.zeros((ns, 3), jnp.int32).at[lab].add(
        jnp.stack([ones_i, ys_i, xs_i], axis=1), mode="drop")
    counts = isums[:, 0]
    area = counts.astype(jnp.float32)
    safe_area = jnp.maximum(area, 1.0)
    cy = isums[:, 1].astype(jnp.float32) / safe_area
    cx = isums[:, 2].astype(jnp.float32) / safe_area

    fvals = [perimeter_map(labels).ravel()]
    if intensity is not None:
        fvals.append(intensity.ravel().astype(jnp.float32))
    fsums = jnp.zeros((ns, len(fvals)), jnp.float32).at[lab].add(
        jnp.stack(fvals, axis=1), mode="drop")
    perim = fsums[:, 0]

    coord = jnp.stack([ys_i, xs_i], axis=1)
    imax = jnp.iinfo(jnp.int32).max
    mins = jnp.full((ns, 2), imax, jnp.int32).at[lab].min(coord, mode="drop")
    maxs = jnp.full((ns, 2), -1, jnp.int32).at[lab].max(coord, mode="drop")
    bbox_min_row, bbox_min_col = mins[:, 0], mins[:, 1]
    bbox_max_row, bbox_max_col = maxs[:, 0] + 1, maxs[:, 1] + 1
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
        out["mean_intensity"] = fsums[:, 1] / safe_area
    return out
