"""Synthetic tracked-tissue factories for tests and benchmarks.

The reference has no test data generator (SURVEY §4 — its only "fixture" is a
missing ``test_images/`` directory, ``Tests.py:17-20``); production-density
synthetic movies are how this rebuild certifies event detection and tracking
at scale without microscope data. Cells are Voronoi regions of drifting seed
points with 1-px boundary lines — the same geometry the watershed produces on
membrane images — and events are PLANTED (a seed removed = delamination, a
seed inserted inside a mother cell = division, a type bit flipped =
differentiation), so detectors can be scored against known ground truth.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["voronoi_labels", "make_tracked_tissue"]


def voronoi_labels(size: int, pts: np.ndarray) -> np.ndarray:
    """(size, size) int32 label map: pixel -> nearest seed index + 1, with
    0-valued 1-px watershed-style lines where 4-neighbor regions meet."""
    from scipy.spatial import cKDTree

    yy, xx = np.mgrid[0:size, 0:size]
    _, idx = cKDTree(pts).query(np.stack([yy.ravel(), xx.ravel()], 1), k=1)
    lab = (idx + 1).astype(np.int32).reshape(size, size)
    lines = np.zeros_like(lab, dtype=bool)
    lines[1:] |= lab[1:] != lab[:-1]
    lines[:, 1:] |= lab[:, 1:] != lab[:, :-1]
    return np.where(lines, 0, lab)


def make_tracked_tissue(
    n_frames: int = 6,
    size: int = 1024,
    n_cells: int = 2000,
    seed: int = 0,
    delaminate: Sequence[Tuple[int, int]] = (),
    divide: Sequence[Tuple[int, int]] = (),
    differentiate: Sequence[Tuple[int, int]] = (),
    capacity: Optional[int] = None,
    jitter: float = 0.3,
):
    """Build a fully tracked :class:`~..core.tissue.Tissue` at the given cell
    density with planted events.

    ``delaminate`` / ``divide`` / ``differentiate``: lists of
    ``(seed_index, frame_from)`` — 1-based frame at which the seed disappears /
    a daughter seed appears just beside it / its type-0 bit turns on.
    Seed index ``i`` tracks as id ``i + 1``; daughters get fresh ids
    ``n_cells + 1, ...`` in ``divide`` order. Returns ``(tissue, info)`` where
    ``info`` maps event kinds to the planted ``(cell_id, frame)`` lists.
    """
    import jax.numpy as jnp

    from tissue_image_processing_tpu.core.tissue import Tissue

    rng = np.random.default_rng(seed)
    # jittered grid seeds: near-uniform density like an epithelium
    g = int(np.ceil(np.sqrt(n_cells)))
    step = size / g
    base = np.stack(np.meshgrid(np.arange(g), np.arange(g)), -1).reshape(-1, 2)
    pts0 = (base + 0.5) * step + rng.normal(0, jitter * step, (g * g, 2))
    pts0 = np.clip(pts0[:n_cells], 1, size - 2)

    cap = capacity or int(2 ** np.ceil(np.log2(n_cells + len(divide) + 8)))
    tissue = Tissue(n_frames, "synthetic", capacity=cap,
                    min_cell_area=0.01, max_cell_area=100.0)
    daughters = {}  # divide order -> (daughter_pos, frame_from, mother_idx)
    for j, (mi, ff) in enumerate(divide):
        off = rng.normal(0, 0.15 * step, 2)
        daughters[j] = (np.clip(pts0[mi] + off, 1, size - 2), ff, mi)

    info = {"delamination": [(mi + 1, ff) for mi, ff in delaminate],
            "division": [(n_cells + 1 + j, ff)
                         for j, (_, ff, _) in daughters.items()],
            "differentiation": [(mi + 1, ff) for mi, ff in differentiate]}

    for f in range(1, n_frames + 1):
        keep = np.ones(n_cells, bool)
        for mi, ff in delaminate:
            if f >= ff:
                keep[mi] = False
        pts = [pts0[keep]]
        ids = [np.nonzero(keep)[0] + 1]
        for j, (dpos, ff, _mi) in daughters.items():
            if f >= ff:
                pts.append(dpos[None])
                ids.append(np.array([n_cells + 1 + j]))
        pts = np.concatenate(pts, 0)
        ids = np.concatenate(ids, 0).astype(np.int32)
        labels = voronoi_labels(size, pts)
        tissue.set_labels(f, labels, reset_data=True)
        tissue.calculate_frame_cellinfo(f)
        table = tissue.get_cells_info(f)
        mask = np.asarray(table.valid_mask())
        ids_row = np.zeros(cap, np.int32)
        ids_row[:ids.size] = ids
        types = np.zeros(cap, np.uint8)
        for mi, ff in differentiate:
            if f >= ff:
                row = np.nonzero(ids == mi + 1)[0]
                if row.size:
                    types[row[0]] = 1
        table = dataclasses.replace(table, type=jnp.asarray(types))
        tissue.apply_track_ids(f, table, ids_row, mask)
    return tissue, info
