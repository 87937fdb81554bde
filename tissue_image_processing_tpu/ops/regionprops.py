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


def _perimeter_int_tables():
    """Weight = (a + b*sqrt2) / 2 with small ints a, b — every skimage border-pattern
    weight is exactly representable, so per-label sums can ride an exact int32
    scatter payload (floats would need either a second f32 scatter or lossy
    fixed-point)."""
    a = jnp.zeros((50,), jnp.int32)
    b = jnp.zeros((50,), jnp.int32)
    a = a.at[jnp.array([5, 7, 15, 17, 25, 27])].set(2)   # weight 1
    b = b.at[jnp.array([21, 33])].set(2)                  # weight sqrt2
    a = a.at[jnp.array([13, 23])].set(1)                  # weight (1+sqrt2)/2
    b = b.at[jnp.array([13, 23])].set(1)
    return a, b


def _perimeter_codes(labels: jnp.ndarray) -> jnp.ndarray:
    """Benkrid/Crookes border-pattern code per pixel (0 for non-border)."""
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
    return jnp.where(border, code, 0)


@jax.jit
def perimeter_map(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel perimeter contribution; segment-sum by label gives each region's
    skimage-compatible perimeter."""
    code = jnp.clip(_perimeter_codes(labels), 0, 49)
    a, b = _perimeter_int_tables()
    return (a[code].astype(jnp.float32) +
            b[code].astype(jnp.float32) * jnp.sqrt(2.0)) / 2.0


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

    Implementation: two scatters (three with intensity) — scatter cost on TPU is
    per-scatter index handling (~12 ms at 1M), nearly independent of payload width,
    so every property is packed into payloads:

    - int32 scatter-ADD of (count, sum_y, sum_x, perim_a, perim_b): coordinate sums
      stay under 2^31 and the perimeter weights are exactly (a + b*sqrt2)/2 with
      small ints, so all sums are EXACT;
    - int32 scatter-MIN of (y, x, -y, -x): bbox mins and maxes in one pass;
    - optional f32 scatter-add for intensity.

    This replaces a two-argsort sort-based build (two 1M argsorts alone ~80 ms).
    """
    H, W = labels.shape
    n = H * W
    lab = labels.astype(jnp.int32).ravel()
    ns = num_labels + 1

    ys_i = (jnp.arange(n, dtype=jnp.int32) // W)
    xs_i = (jnp.arange(n, dtype=jnp.int32) % W)
    ones_i = jnp.ones((n,), jnp.int32)

    code = jnp.clip(_perimeter_codes(labels), 0, 49).ravel()
    pa, pb = _perimeter_int_tables()
    isums = jnp.zeros((ns, 5), jnp.int32).at[lab].add(
        jnp.stack([ones_i, ys_i, xs_i, pa[code], pb[code]], axis=1), mode="drop")
    counts = isums[:, 0]
    area = counts.astype(jnp.float32)
    safe_area = jnp.maximum(area, 1.0)
    cy = isums[:, 1].astype(jnp.float32) / safe_area
    cx = isums[:, 2].astype(jnp.float32) / safe_area
    perim = (isums[:, 3].astype(jnp.float32) +
             isums[:, 4].astype(jnp.float32) * jnp.sqrt(2.0)) / 2.0

    imax = jnp.iinfo(jnp.int32).max
    mins = jnp.full((ns, 4), imax, jnp.int32).at[lab].min(
        jnp.stack([ys_i, xs_i, -ys_i, -xs_i], axis=1), mode="drop")
    bbox_min_row, bbox_min_col = mins[:, 0], mins[:, 1]
    bbox_max_row, bbox_max_col = -mins[:, 2] + 1, -mins[:, 3] + 1
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
        isum = jnp.zeros((ns,), jnp.float32).at[lab].add(
            intensity.ravel().astype(jnp.float32), mode="drop")
        out["mean_intensity"] = isum / safe_area
    return out
