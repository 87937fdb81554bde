"""Connected-component labeling on device.

TPU-native replacement for ``skimage.measure.label`` / ``scipy.ndimage.label``
(used by the reference for splitting cells after line edits, ``tissue_info.py:2922``,
and for seeding watershed minima).

Algorithm: union-find by label-propagation with hooking + path compression
(pointer-jumping), the standard data-parallel CC scheme. Each pixel starts as its own
root (its flattened index); every round each masked pixel (a) takes the min root among
itself and its masked neighbors, (b) hooks that min onto its current root with a
scatter-min, (c) compresses paths twice. Convergence takes O(log(diameter)) rounds, each
round a handful of gathers/shift-compares over the whole image — ideal for the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tissue_image_processing_tpu.ops.morphology import shift2d

__all__ = ["connected_components", "relabel_sequential", "relabel_roots",
           "relabel_by_raster_order"]


def _neighbor_shifts(connectivity: int):
    if connectivity == 1:
        return [(1, 0), (-1, 0), (0, 1), (0, -1)]
    return [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)]


@functools.partial(jax.jit, static_argnames=("connectivity",))
def connected_components(
    mask: jnp.ndarray,
    connectivity: int = 1,
) -> jnp.ndarray:
    """Label connected components of a boolean mask.

    Gather-only label propagation with pointer jumping: every masked pixel carries
    the flat index of some lower-indexed pixel in its component; each round takes the
    min over neighbors (diffusion) then dereferences the pointer twice (jumping), so
    convergence is O(log diameter) rounds of pure shifts + gathers — TPU scatters
    (the usual union-find hooking step) are avoided entirely.

    Returns an int32 map where background = 0 and components are labeled 1..N in
    raster order of their first (top-left-most) pixel — matching scipy/skimage
    labeling order so downstream label<->row contracts line up.
    """
    H, W = mask.shape
    n = H * W
    idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    INF = jnp.int32(n)
    lbl = jnp.where(mask, idx, INF)

    shifts = _neighbor_shifts(connectivity)
    mask_f = mask.ravel()

    def body(state):
        lbl, _ = state
        m = lbl
        for dy, dx in shifts:
            m = jnp.minimum(m, shift2d(lbl, dy, dx, INF))
        m = jnp.where(mask, m, INF)
        # pointer jumping: follow the index twice (gathers only)
        flat = m.ravel()
        safe = jnp.clip(flat, 0, n - 1)
        flat = jnp.where(mask_f, jnp.minimum(flat, flat[safe]), INF)
        safe = jnp.clip(flat, 0, n - 1)
        flat = jnp.where(mask_f, jnp.minimum(flat, flat[safe]), INF)
        new = flat.reshape(H, W)
        return new, jnp.any(new != lbl)

    lbl, _ = jax.lax.while_loop(lambda s: s[1], body, body((lbl, jnp.bool_(True))))
    root = jnp.where(mask, lbl, -1)
    return relabel_roots(root)


@jax.jit
def relabel_roots(roots: jnp.ndarray) -> jnp.ndarray:
    """Dense raster-order 1..N labels from a ROOT-INDEX map (-1 = background).

    A root map assigns every foreground pixel the flat index of its component's
    top-left pixel (which therefore points to itself). Ranking roots is then just a
    prefix count of self-pointing pixels — one cumsum + one gather, no sort and no
    scatter (relabel_sequential's sort costs ~20 ms at 1M on TPU; this is ~2 ms).
    """
    flat = roots.ravel()
    n = flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    rank = jnp.cumsum((flat == idx).astype(jnp.int32))  # 1-based at each root
    out = jnp.where(flat >= 0, rank[jnp.clip(flat, 0, n - 1)], 0)
    return out.reshape(roots.shape).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("background",))
def relabel_sequential(labels: jnp.ndarray, background: int = 0) -> jnp.ndarray:
    """Map integer labels to consecutive 1..N (background -> 0).

    Labels are ranked by value, so if input labels are root-pixel flat indices the
    output ordering matches raster-scan first-encounter order (scipy-compatible).

    Contract: non-background values must lie in [0, labels.size) — true for every
    producer here (root flat indices, dense 1..N maps). This admits a sort + one
    scatter + one gather; the searchsorted alternative is a ~20-level binary search
    whose every level is a full-size gather (~300 ms at 1M elements on TPU, vs ~30 ms
    for this formulation).
    """
    flat = labels.ravel().astype(jnp.int32)
    n = flat.shape[0]
    is_bg = flat == background
    big = jnp.where(is_bg, n, flat)  # sentinel n sorts after all real values
    s = jnp.sort(big)
    newflag = jnp.concatenate([jnp.ones((1,), jnp.int32),
                               (s[1:] != s[:-1]).astype(jnp.int32)])
    rank = jnp.cumsum(newflag)  # 1-based rank among distinct sorted values
    # duplicates of a value all carry the same rank, so any scatter winner is correct
    table = jnp.zeros((n + 1,), jnp.int32).at[s].set(rank, mode="drop")
    out = table[jnp.clip(big, 0, n)]
    out = jnp.where(is_bg, 0, out)
    return out.reshape(labels.shape)


def relabel_by_raster_order(labels: jnp.ndarray) -> jnp.ndarray:
    """Relabel 1..N by raster order of each component's first pixel (background 0)."""
    flat = labels.ravel()
    n = flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    num = int(jnp.max(flat)) + 1 if flat.size else 1
    first = jax.ops.segment_min(idx, flat, num_segments=num)
    first = first.at[0].set(-1)
    key = first[flat]
    return relabel_sequential(key.reshape(labels.shape), background=-1)
