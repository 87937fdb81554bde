"""Neighbor graph and contact lengths as scatter/matmul kernels.

TPU-native replacements for the reference's per-cell python loops:
- neighbor graph via 5x5 max-filter dilation (``tissue_info.py:1815-1842``): a cell's
  dilation covering another cell's pixels makes them neighbors. The whole graph is one
  max-filter + one scatter into a padded adjacency matrix (vs O(cells * pixels) masked
  scans in the reference).
- contact lengths via plus-shaped max/min filters (``tissue_info.py:1844-1872``,
  ``:4073-4094``): every boundary pixel votes for its (larger, smaller) label pair; one
  scatter-add builds the full symmetric contact matrix.
- second-order neighbors (``tissue_info.py:2513-2543``) as a boolean matmul on the MXU.
  NOTE: the reference *intends* to exclude first-order neighbors but calls
  ``set.difference`` without assignment (a no-op at ``tissue_info.py:2539``), so first
  -order neighbors reachable through a valid intermediate are included; we reproduce
  that behavior for parity (self is excluded).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tissue_image_processing_tpu.ops.morphology import (
    maximum_filter,
    plus_maximum_filter,
    plus_minimum_filter,
)

__all__ = ["adjacency_matrix", "adjacency_matrix_checked", "adjacency_overflow",
           "neighbor_lists", "contact_length_matrix",
           "contact_length_matrix_checked", "second_order_adjacency"]


def _vote_keys(labels: jnp.ndarray, ns: int) -> jnp.ndarray:
    """(H, W) int32 vote keys a*ns + b with a = 5x5 window max, b = pixel label;
    0 where the vote is invalid (background pixel or interior a == b)."""
    lab = labels.astype(jnp.int32)
    dil = maximum_filter(lab, 5)  # constant-0 padding like the reference
    valid = (lab > 0) & (dil != lab)
    return jnp.where(valid, dil * ns + lab, 0)


def _run_starts(key: jnp.ndarray) -> jnp.ndarray:
    """Zero every vote that repeats its left neighbor, keeping run STARTS.

    Votes along an image row are piecewise constant (a and b are both locally
    constant label fields), so the run-starts carry the full distinct pair set
    exactly. This single definition is the exactness contract shared by the
    compaction and its overflow check."""
    return jnp.concatenate(
        [key[:, :1], jnp.where(key[:, 1:] != key[:, :-1], key[:, 1:], 0)], 1)


def _row_overflow(first: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.any(jnp.sum((first > 0).astype(jnp.int32), axis=1) > k)


def _compact_votes(key: jnp.ndarray, k: int):
    """Run-dedup + top_k compaction of the per-pixel vote field.

    ``top_k`` over the run-starts bounds the scatter update count at H*k
    instead of H*W. Returns (vals (H, k) int32 descending with 0-padding,
    overflow bool scalar — True iff some row had more than k run-starts, i.e.
    its smallest-key pairs were dropped). Real segmentations measured 36-46
    run-starts/row at 1024^2 / 900 cells (probe_adjfast.py), so k=192 carries
    a ~4x margin; adversarial label maps (alternating 1-px labels) can exceed
    any static k, hence the flag.
    """
    first = _run_starts(key)
    overflow = _row_overflow(first, k)
    vals, _ = jax.lax.top_k(first, min(k, key.shape[1]))
    return vals, overflow


@functools.partial(jax.jit, static_argnames=("num_labels", "k"))
def adjacency_overflow(labels: jnp.ndarray, num_labels: int, k: int = 192) -> jnp.ndarray:
    """Bool scalar: would ``adjacency_matrix(..., compact_k=k)`` drop pairs on
    this label map? (Host callers check this to fall back to the exact path;
    fused host paths get the same flag for free from
    ``adjacency_matrix_checked`` / ``frame_cellinfo_checked``.)"""
    key = _vote_keys(labels, num_labels + 1)
    return _row_overflow(_run_starts(key), k)


@functools.partial(jax.jit, static_argnames=("num_labels", "compact_k"))
def adjacency_matrix_checked(
    labels: jnp.ndarray,
    num_labels: int,
    working_mask: Optional[jnp.ndarray] = None,
    compact_k: int = 192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compacted adjacency plus its overflow flag in ONE program:
    (adj, overflow). ``overflow`` True means some row exceeded ``compact_k``
    vote runs and pairs were dropped — recompute with the exact path."""
    return _adjacency_impl(labels, num_labels, working_mask, compact_k,
                           with_overflow=True)


@functools.partial(jax.jit, static_argnames=("num_labels", "compact_k"))
def adjacency_matrix(
    labels: jnp.ndarray,
    num_labels: int,
    working_mask: Optional[jnp.ndarray] = None,
    compact_k: Optional[int] = None,
) -> jnp.ndarray:
    """(num_labels+1, num_labels+1) bool adjacency; adj[a, b] == adj[b, a].

    ``working_mask``: optional (num_labels+1,) bool — only pairs whose *larger* label
    (the 5x5 window max, i.e. the cell being iterated in the reference) is in the mask
    are inserted, matching ``find_neighbors(only_for_labels=...)`` semantics.

    ``compact_k``: when set, the per-pixel vote field is run-deduplicated along
    rows and top_k-compacted before the scatter (H*k updates instead of H*W —
    6.1 -> 1.2 ms at 1024^2, probe_adjfast.py). Exact whenever every image row
    carries <= compact_k distinct vote runs (any real segmentation; use
    ``adjacency_matrix_checked``/``adjacency_overflow`` to verify, or leave
    None for the unconditionally exact 1-update-per-pixel scatter).
    """
    return _adjacency_impl(labels, num_labels, working_mask, compact_k,
                           with_overflow=False)


def _adjacency_impl(labels, num_labels, working_mask, compact_k, with_overflow):
    ns = num_labels + 1
    key = _vote_keys(labels, ns)
    overflow = None
    if compact_k is not None:
        votes, overflow = _compact_votes(key, compact_k)
        flat_idx = votes.ravel()
    else:
        flat_idx = key.ravel()
    adj = jnp.zeros((ns * ns,), jnp.bool_)
    adj = adj.at[flat_idx].set(True)
    adj = adj.at[0].set(False)
    adj = adj.reshape(ns, ns)
    if working_mask is not None:
        # row masking AFTER the scatter == filtering the pixel votes whose
        # window-max label a is outside the mask (rows of the pre-symmetrized
        # matrix ARE the a side), but costs a (N+1)^2 AND instead of a
        # 1M-element per-pixel gather (+8.6 ms/frame measured at 1024^2)
        adj = adj & working_mask[:, None]
    adj = adj | adj.T
    adj = adj.at[:, 0].set(False).at[0, :].set(False)
    # no self loops
    adj = adj & (~jnp.eye(ns, dtype=bool))
    if with_overflow:
        return adj, overflow
    return adj


@functools.partial(jax.jit, static_argnames=("max_neighbors",))
def neighbor_lists(adj: jnp.ndarray, max_neighbors: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert an adjacency matrix to padded neighbor lists.

    Returns (neighbors, counts): neighbors (N+1, max_neighbors) int32 with label ids
    (0 = padding) sorted ascending, counts (N+1,) int32.
    """
    ns = adj.shape[0]
    # top_k over (present, -column) pulls the smallest-index neighbors first —
    # much cheaper than a full row argsort at (N+1, N+1)
    col = jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 1)
    key = jnp.where(adj, ns - col, 0)
    vals, order = jax.lax.top_k(key, min(max_neighbors, ns))
    present = vals > 0
    neighbors = jnp.where(present, order, 0).astype(jnp.int32)
    if neighbors.shape[1] < max_neighbors:
        pad = max_neighbors - neighbors.shape[1]
        neighbors = jnp.pad(neighbors, ((0, 0), (0, pad)))
    counts = jnp.sum(adj, axis=1).astype(jnp.int32)
    return neighbors, counts


def _run_lengths(key: jnp.ndarray) -> jnp.ndarray:
    """(H, W) int32: at each run-START position, the length of that run
    within its row; 0 elsewhere. Together with ``_run_starts`` this is an
    exact RLE of the vote field (sum of lengths per key == pixel count)."""
    H, W = key.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    chg = jnp.concatenate(
        [jnp.ones((H, 1), bool), key[:, 1:] != key[:, :-1]], 1)
    m = jnp.where(chg, idx, W)
    # nm[j] = min_{j' >= j} m[j']; the NEXT change strictly after j is nm[j+1]
    nm = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(m, 1), axis=1), 1)
    nxt = jnp.concatenate([nm[:, 1:], jnp.full((H, 1), W, jnp.int32)], 1)
    return jnp.where(chg, nxt - idx, 0)


@functools.partial(jax.jit, static_argnames=("num_labels", "compact_k"))
def contact_length_matrix_checked(labels: jnp.ndarray, num_labels: int,
                                  compact_k: int = 192):
    """Compacted contact matrix plus its overflow flag: (mat, overflow)."""
    return _contact_impl(labels, num_labels, compact_k, with_overflow=True)


@functools.partial(jax.jit, static_argnames=("num_labels", "compact_k"))
def contact_length_matrix(labels: jnp.ndarray, num_labels: int,
                          compact_k: Optional[int] = None) -> jnp.ndarray:
    """Symmetric (N+1, N+1) float32 matrix of shared-boundary pixel counts.

    Matches the reference's plus-filter construction
    (``tissue_info.py:4073-4094``): boundary pixel p belongs to the pair
    (max over plus-neighbors, min over plus-neighbors with 0 treated as N+1).

    ``compact_k``: RLE the piecewise-constant vote rows (run-start keys +
    run lengths) and top_k-compact to H*k scatter-adds instead of H*W —
    same exactness contract as ``adjacency_matrix`` (every row <= k vote
    runs; ``contact_length_matrix_checked`` reports overflow).
    """
    return _contact_impl(labels, num_labels, compact_k, with_overflow=False)


def _contact_impl(labels, num_labels, compact_k, with_overflow):
    lab = labels.astype(jnp.int32)
    mx = plus_maximum_filter(lab, cval=0)
    big = num_labels + 1
    lab_nz = jnp.where(lab == 0, big, lab)
    mn = plus_minimum_filter(lab_nz, cval=0)
    valid = (mx > mn) & (mn > 0) & (mx <= num_labels)
    ns = num_labels + 1
    key = jnp.where(valid, mx * ns + mn, 0)
    overflow = None
    if compact_k is not None:
        first = _run_starts(key)
        overflow = _row_overflow(first, compact_k)
        lens = _run_lengths(key)
        vals, pos = jax.lax.top_k(first, min(compact_k, key.shape[1]))
        run_len = jnp.take_along_axis(lens, pos, axis=1)
        flat_idx = vals.ravel()
        add = jnp.where(vals > 0, run_len, 0).ravel().astype(jnp.float32)
    else:
        flat_idx = key.ravel()
        add = valid.ravel().astype(jnp.float32)
    counts = jnp.zeros((ns * ns,), jnp.float32)
    counts = counts.at[flat_idx].add(add)
    counts = counts.reshape(ns, ns)
    counts = counts.at[0, 0].set(0.0)
    counts = counts + counts.T
    if with_overflow:
        return counts, overflow
    return counts


@jax.jit
def second_order_adjacency(
    adj: jnp.ndarray,
    intermediate_valid: jnp.ndarray,
    target_ok: jnp.ndarray,
) -> jnp.ndarray:
    """adj2[i, k] = exists j: adj[i, j] & intermediate_valid[j] & adj[j, k] & target_ok[k].

    One bf16/int matmul on the MXU replaces the reference's nested set unions
    (``tissue_info.py:2513-2543``). Self-pairs are removed; first-order neighbors are
    kept (reference parity — see module docstring).
    """
    a = adj.astype(jnp.float32)
    mid = a * intermediate_valid.astype(jnp.float32)[None, :]
    reach = jnp.dot(mid, a, preferred_element_type=jnp.float32) > 0
    reach = reach & target_ok[None, :]
    ns = adj.shape[0]
    reach = reach & (~jnp.eye(ns, dtype=bool))
    reach = reach.at[:, 0].set(False).at[0, :].set(False)
    return reach
