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

    Implementation: radix one-hot matmuls on the MXU — a TPU scatter costs ~10 ms
    per 1M indices regardless of payload, but splitting the label into
    (lo = l % 64, hi = l // 64) digits turns every per-label sum into
    (onehot_lo * v)^T @ onehot_hi, a dense (64, n) x (n, nhi) matmul (~0.5 ms per
    channel), and per-row/column label PRESENCE into batched einsums whose
    arg-extrema give the bbox. All sums are exact: one-hots are 0/1, the perimeter
    weights are (a + b*sqrt2)/2 with small ints, and MXU accumulation is f32
    (cell sums << 2^24).
    """
    H, W = labels.shape
    n = H * W
    lab_raw = labels.astype(jnp.int32)
    # Labels beyond the static capacity are masked to background (slot 0), never
    # pooled into the top slot; `overflow` reports how many labels were dropped so
    # callers can re-run at a larger capacity (SURVEY §7 "ragged cell data").
    overflow = jnp.maximum(jnp.max(lab_raw) - num_labels, 0)
    lab2 = jnp.where(lab_raw > num_labels, 0, jnp.maximum(lab_raw, 0))
    ns = num_labels + 1
    RLO = 64
    nhi = -(-ns // RLO)
    lo2 = lab2 % RLO
    hi2 = lab2 // RLO
    f32 = jnp.float32
    oh_lo = (lo2.ravel()[:, None] == jnp.arange(RLO)[None, :]).astype(f32)
    oh_hi = (hi2.ravel()[:, None] == jnp.arange(nhi)[None, :]).astype(f32)

    ys_f = (jnp.arange(n, dtype=jnp.int32) // W).astype(f32)
    xs_f = (jnp.arange(n, dtype=jnp.int32) % W).astype(f32)
    code = jnp.clip(_perimeter_codes(labels), 0, 49).ravel()
    pa, pb = _perimeter_int_tables()
    channels = [jnp.ones((n,), f32), ys_f, xs_f,
                pa[code].astype(f32), pb[code].astype(f32)]
    if intensity is not None:
        channels.append(intensity.ravel().astype(f32))

    # one independent (ch * onehot_lo)^T @ onehot_hi matmul per channel (NOT a
    # stacked einsum): callers that only consume area/centroids (e.g. the
    # tracking pipeline) let XLA dead-code-eliminate the perimeter channels,
    # including their border-pattern code computation
    def seg_sum(ch):
        prod = ch[:, None] * oh_lo  # (n, RLO)
        s = jax.lax.dot_general(prod, oh_hi, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        # (RLO, nhi); label l lives at [l%64, l//64]
        return jnp.transpose(s, (1, 0)).reshape(-1)[:ns]

    sums = [seg_sum(ch) for ch in channels]

    counts = sums[0].astype(jnp.int32)
    area = sums[0]
    safe_area = jnp.maximum(area, 1.0)
    cy = sums[1] / safe_area
    cx = sums[2] / safe_area
    perim = (sums[3] + sums[4] * jnp.sqrt(2.0)) / 2.0

    # bbox via per-row / per-column presence (bf16 one-hots, f32 accumulation:
    # a nonzero count cannot round to zero)
    bf = jnp.bfloat16
    ohl2 = (lo2[..., None] == jnp.arange(RLO)).astype(bf)   # (H, W, 64)
    ohh2 = (hi2[..., None] == jnp.arange(nhi)).astype(bf)   # (H, W, nhi)
    pres_y = jnp.einsum("ywl,ywh->ylh", ohl2, ohh2,
                        preferred_element_type=f32) > 0
    pres_x = jnp.einsum("ywl,ywh->wlh", ohl2, ohh2,
                        preferred_element_type=f32) > 0
    pres_y = jnp.transpose(pres_y, (0, 2, 1)).reshape(H, -1)[:, :ns]
    pres_x = jnp.transpose(pres_x, (0, 2, 1)).reshape(W, -1)[:, :ns]
    big = jnp.int32(1 << 29)
    yi = jnp.arange(H, dtype=jnp.int32)[:, None]
    xi = jnp.arange(W, dtype=jnp.int32)[:, None]
    bbox_min_row = jnp.min(jnp.where(pres_y, yi, big), axis=0)
    bbox_max_row = jnp.max(jnp.where(pres_y, yi, -1), axis=0) + 1
    bbox_min_col = jnp.min(jnp.where(pres_x, xi, big), axis=0)
    bbox_max_col = jnp.max(jnp.where(pres_x, xi, -1), axis=0) + 1
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
        "overflow": overflow,
    }
    if intensity is not None:
        out["mean_intensity"] = sums[5] / safe_area
    return out
