"""Single-device fused whole-movie pipeline.

The reference runs the movie workflow as GUI-thread loops with a host
round-trip per frame (segment-all ``gui.py:1348-1376``, tracking
``gui.py:1590-1603``); the multi-chip analog here is
``parallel/pipeline.py``. This module is the single-chip product API for the
same end-to-end path — projection -> watershed segmentation -> cell tables ->
drift -> tracking — as ONE jitted device program over the whole movie
(frames flood in stacked Pallas batches, tables vmap into radix matmuls,
tracking is one auction scan), with a single host read at the end. It is the
path the BASELINE north star measures (bench.py), exposed to users via
``cli pipeline``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["movie_pipeline"]


def _flood_batch(T: int, batch: int) -> int:
    b = max(1, min(batch, T))
    while T % b:
        b -= 1
    return b


@functools.partial(jax.jit, static_argnames=(
    "reference_channel", "threshold", "std", "block_size", "capacity",
    "batch", "airyscan", "project"))
def _segment_program(movie, reference_channel=0, threshold=0.2, std=3.0,
                     block_size=101, capacity=1024, batch=2, airyscan=False,
                     project=True):
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo_checked
    from tissue_image_processing_tpu.core.tracking import compute_drift_chain
    from tissue_image_processing_tpu.ops.watershed import (
        watershed_segmentation_batch)
    from tissue_image_processing_tpu.projection.surface import (
        project_timepoint_auto)

    T = movie.shape[0]

    def ref_of(stack):
        if project:
            proj, _ = project_timepoint_auto(
                stack, reference_channel=reference_channel, airyscan=airyscan)
            return proj[reference_channel]
        return stack[reference_channel, 0].astype(jnp.float32)

    refs = jax.lax.map(ref_of, movie)                       # (T, Y, X)
    refs_t = jnp.swapaxes(refs, 1, 2)                       # x-major space
    B = _flood_batch(T, batch)

    def seg_group(group):
        return watershed_segmentation_batch(group, threshold, std, block_size)

    labels = jax.lax.map(
        seg_group, refs_t.reshape(T // B, B, *refs_t.shape[1:]))
    labels = labels.reshape(T, *labels.shape[2:])
    # compacted adjacency votes: exact for <= 192 vote runs per label row
    # (any real segmentation; ops/neighbors.py docstring has the contract) —
    # the per-frame overflow flags ride the same program so the host driver
    # can recompute any flagged frame's table with the exact scatter
    tabs, overflow = jax.vmap(lambda l: frame_cellinfo_checked(
        l, capacity=capacity, neighbor_compact_k=192))(labels)
    drifts = compute_drift_chain(refs_t)
    return labels, tabs, drifts, overflow


def movie_pipeline(movie: jnp.ndarray, *, reference_channel: int = 0,
                   threshold: float = 0.2, std: float = 3.0,
                   block_size: int = 101, capacity: int = 1024,
                   batch: int = 2, airyscan: bool = False,
                   search_range: float = 100.0, memory: int = 3,
                   drifts: Optional[np.ndarray] = None):
    """(T, C, Z, Y, X) movie -> dict with per-frame segment ``labels``
    (T, X, Y — the reference's transposed convention), stacked cell
    ``tables`` (CellTable of (T, capacity) arrays), ``drifts`` (T, 2) and
    tracked ``ids`` (T, capacity; 0 = no cell).

    Z == 1 skips the surface projection. Tracking uses the trackpy-faithful
    adaptive radii (reference ``adaptive_stop=10``): segmentation and tables
    run in one device program, the radii come from one host pass over the
    tables, and the tracking scan is a second small program.
    """
    from tissue_image_processing_tpu.core.tracking import (
        adaptive_effective_ranges, track_movie)

    if movie.ndim != 5:
        raise ValueError(f"movie must be (T, C, Z, Y, X), got {movie.shape}")
    project = movie.shape[2] > 1
    labels, tabs, dr, overflow = _segment_program(
        movie, reference_channel=reference_channel, threshold=threshold,
        std=std, block_size=block_size, capacity=capacity, batch=batch,
        airyscan=airyscan, project=project)
    if drifts is None:
        drifts = np.asarray(dr)
    cy, cx, area, mask = (np.asarray(tabs.cy), np.asarray(tabs.cx),
                          np.asarray(tabs.area), np.asarray(tabs.valid_mask()))
    ranges = adaptive_effective_ranges(cy, cx, area, mask, drifts=drifts,
                                       search_range=search_range)
    ids = track_movie(jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
                      jnp.asarray(mask), drifts=jnp.asarray(drifts, jnp.float32),
                      search_range=search_range, memory=memory,
                      capacity=2 * capacity,
                      search_ranges=jnp.asarray(ranges, jnp.float32))
    return {"labels": labels, "tables": tabs, "drifts": drifts,
            "ids": np.asarray(ids),
            # (T,) bool: frames whose compacted adjacency dropped pairs —
            # recompute those frames' tables with frame_cellinfo(compact=None)
            "neighbor_overflow": np.asarray(overflow)}
