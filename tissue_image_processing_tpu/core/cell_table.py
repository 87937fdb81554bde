"""Struct-of-arrays cell tables.

TPU-native replacement for the reference's per-frame pandas DataFrames
(``CELL_INFO_SPECS``, ``tissue_info.py:39-52``): a frozen pytree of fixed-capacity
padded arrays (index = label - 1, exactly the reference's label<->row contract,
``tissue_info.py:424,431-444``) so per-frame analysis, tracking and statistics run
vmapped on device. ``to_pandas``/``from_pandas`` bridge to the host stats layer and
the .seg persistence format.

The multi-type bitmask system matches the reference (``tissue_info.py:146-191``):
``type`` is uint8, bit k set = positive for type k, 255 = invalid.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tissue_image_processing_tpu.ops.neighbors import (
    adjacency_matrix, adjacency_matrix_checked, neighbor_lists)
from tissue_image_processing_tpu.ops.regionprops import regionprops

INVALID_TYPE_INDEX = 255
CELL_INFO_COLUMNS = [
    "area", "perimeter", "label", "cx", "cy", "neighbors", "n_neighbors", "valid",
    "type", "bounding_box_min_row", "bounding_box_min_col", "bounding_box_max_row",
    "bounding_box_max_col", "empty_cell",
]


def is_positive_for_type(cell_type, type_index):
    """Bitmask type query (reference ``is_positive_for_type``,
    ``tissue_info.py:146-177``). ``type_index`` may be an int or a
    (pos_list, neg_list) tuple; invalid cells (255) are never positive."""
    if isinstance(type_index, tuple):
        pos_types, neg_types = type_index
        res = jnp.ones(jnp.shape(cell_type), bool)
        for t in pos_types:
            res = res & is_positive_for_type(cell_type, t)
        for t in neg_types:
            res = res & ~is_positive_for_type(cell_type, t)
        return res
    if type_index < 0:
        return jnp.zeros(jnp.shape(cell_type), bool)
    ct = jnp.asarray(cell_type).astype(jnp.uint8)
    bit = jnp.uint8(1 << type_index)
    res = (ct & bit) == bit
    return res & (ct != INVALID_TYPE_INDEX)


def change_type(current_type, type_index: int, is_positive):
    """Set/clear one type bit; invalid cells become valid first (reference
    ``change_type``, ``tissue_info.py:179-191``)."""
    ct = jnp.asarray(current_type).astype(jnp.uint8)
    ct = jnp.where(ct == INVALID_TYPE_INDEX, jnp.uint8(0), ct)
    bit = jnp.uint8(1 << type_index)
    cleared = ct & (~bit)
    return jnp.where(is_positive, cleared | bit, cleared)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CellTable:
    """One frame's cells as padded arrays of capacity N (index = label - 1 offset by
    one: row i holds segmentation label i+1)."""

    area: jnp.ndarray          # (N,) f32
    perimeter: jnp.ndarray     # (N,) f32
    label: jnp.ndarray         # (N,) i32 — track id, 0 = unassigned
    cx: jnp.ndarray            # (N,) f32
    cy: jnp.ndarray            # (N,) f32
    valid: jnp.ndarray         # (N,) i32
    type: jnp.ndarray          # (N,) u8 bitmask
    bbox: jnp.ndarray          # (N, 4) i32 (min_row, min_col, max_row, max_col)
    empty_cell: jnp.ndarray    # (N,) i32 — 1 if slot has no cell
    neighbors: jnp.ndarray     # (N, K) i32 segmentation labels, 0-padded
    n_neighbors: jnp.ndarray   # (N,) i32

    @property
    def capacity(self) -> int:
        return self.area.shape[0]

    def exists(self) -> jnp.ndarray:
        return self.empty_cell == 0

    def valid_mask(self) -> jnp.ndarray:
        return (self.valid == 1) & (self.empty_cell == 0)

    @classmethod
    def empty(cls, capacity: int, max_neighbors: int = 64) -> "CellTable":
        z = jnp.zeros((capacity,), jnp.float32)
        zi = jnp.zeros((capacity,), jnp.int32)
        return cls(area=z, perimeter=z, label=zi, cx=z, cy=z, valid=zi,
                   type=jnp.zeros((capacity,), jnp.uint8),
                   bbox=jnp.zeros((capacity, 4), jnp.int32),
                   empty_cell=jnp.ones((capacity,), jnp.int32),
                   neighbors=jnp.zeros((capacity, max_neighbors), jnp.int32),
                   n_neighbors=zi)

    def to_pandas(self):
        """Materialize as a reference-schema pandas DataFrame (sets for neighbors),
        interoperable with the .seg pickles the reference writes."""
        import pandas as pd

        n = self.capacity
        nbrs = np.asarray(self.neighbors)
        counts = np.asarray(self.n_neighbors)
        neighbor_sets = [set(map(int, nbrs[i, :counts[i]])) for i in range(n)]
        df = pd.DataFrame({
            "area": np.asarray(self.area, np.float64),
            "perimeter": np.asarray(self.perimeter, np.float64),
            "label": np.asarray(self.label, np.int64),
            "cx": np.asarray(self.cx, np.float64),
            "cy": np.asarray(self.cy, np.float64),
            "neighbors": neighbor_sets,
            "n_neighbors": np.asarray(self.n_neighbors, np.int64),
            "valid": np.asarray(self.valid, np.int64),
            "type": np.asarray(self.type, np.uint8),
            "bounding_box_min_row": np.asarray(self.bbox[:, 0], np.int64),
            "bounding_box_min_col": np.asarray(self.bbox[:, 1], np.int64),
            "bounding_box_max_row": np.asarray(self.bbox[:, 2], np.int64),
            "bounding_box_max_col": np.asarray(self.bbox[:, 3], np.int64),
            "empty_cell": np.asarray(self.empty_cell, np.int64),
        })
        return df

    @classmethod
    def from_pandas(cls, df, capacity: Optional[int] = None,
                    max_neighbors: int = 64) -> "CellTable":
        n = len(df)
        cap = capacity or n
        t = cls.empty(cap, max_neighbors)
        nbrs = np.zeros((cap, max_neighbors), np.int32)
        counts = np.zeros((cap,), np.int32)
        for i, s in enumerate(df["neighbors"].tolist()[:cap]):
            vals = sorted(int(v) for v in s)[:max_neighbors]
            nbrs[i, :len(vals)] = vals
            counts[i] = len(vals)

        def put(col, dtype):
            arr = np.zeros((cap,), dtype)
            arr[:n] = np.asarray(df[col], dtype)[:cap]
            return jnp.asarray(arr)

        bbox = np.zeros((cap, 4), np.int32)
        for j, col in enumerate(["bounding_box_min_row", "bounding_box_min_col",
                                 "bounding_box_max_row", "bounding_box_max_col"]):
            bbox[:n, j] = np.asarray(df[col], np.int32)[:cap]
        empty = np.ones((cap,), np.int32)
        empty[:n] = np.asarray(df["empty_cell"], np.int32)[:cap]
        return cls(
            area=put("area", np.float32), perimeter=put("perimeter", np.float32),
            label=put("label", np.int32), cx=put("cx", np.float32),
            cy=put("cy", np.float32), valid=put("valid", np.int32),
            type=put("type", np.uint8), bbox=jnp.asarray(bbox),
            empty_cell=jnp.asarray(empty), neighbors=jnp.asarray(nbrs),
            n_neighbors=jnp.asarray(counts))


@functools.partial(jax.jit, static_argnames=("capacity", "max_neighbors",
                                             "with_neighbors",
                                             "neighbor_compact_k"))
def frame_cellinfo(
    labels: jnp.ndarray,
    capacity: int,
    max_neighbors: int = 64,
    min_cell_area: float = 0.1,
    max_cell_area: float = 10.0,
    intensity: Optional[jnp.ndarray] = None,
    with_neighbors: bool = True,
    neighbor_compact_k: Optional[int] = None,
) -> CellTable:
    """Compute one frame's cell table from a label map (the device-side equivalent of
    ``Tissue.calculate_frame_cellinfo`` + ``find_neighbors``,
    ``tissue_info.py:880-909,1815-1842``): regionprops via segment reductions,
    validity by area in (min_frac, max_frac) x mean area, neighbor graph via the 5x5
    max-filter scatter restricted to valid cells.

    ``with_neighbors=False`` skips the neighbor graph and zero-fills
    ``neighbors``/``n_neighbors``. The graph's adjacency scatter is the most
    expensive piece of the table (~6.4 ms at 1024^2, probe_cellinfo.py —
    XLA's scatter serializes 1M pixel votes); XLA dead-code-eliminates it
    when those outputs go unused, but tracking-only callers should pass the
    flag rather than rely on DCE surviving vmap/scan/export contexts.

    ``neighbor_compact_k``: run-dedup + top_k vote compaction for the
    adjacency scatter (6.1 -> 1.2 ms at 1024^2) — exact whenever every label
    row has <= k distinct vote runs; see ``ops.neighbors.adjacency_matrix``.
    Host callers use ``frame_cellinfo_checked`` (same program + overflow
    flag) and retry exact (``Tissue.calculate_frame_cellinfo`` does)."""
    return _frame_cellinfo_impl(labels, capacity, max_neighbors, min_cell_area,
                                max_cell_area, intensity, with_neighbors,
                                neighbor_compact_k)[0]


@functools.partial(jax.jit, static_argnames=("capacity", "max_neighbors",
                                             "neighbor_compact_k"))
def frame_cellinfo_checked(
    labels: jnp.ndarray,
    capacity: int,
    max_neighbors: int = 64,
    min_cell_area: float = 0.1,
    max_cell_area: float = 10.0,
    intensity: Optional[jnp.ndarray] = None,
    neighbor_compact_k: int = 192,
) -> Tuple[CellTable, jnp.ndarray]:
    """``frame_cellinfo`` with the compacted adjacency scatter AND its
    overflow flag from the same device program: (table, overflow). Host
    callers read the flag with the table and recompute exact
    (``neighbor_compact_k=None``) on the rare overflow."""
    return _frame_cellinfo_impl(labels, capacity, max_neighbors, min_cell_area,
                                max_cell_area, intensity, True,
                                neighbor_compact_k)


def _frame_cellinfo_impl(
    labels: jnp.ndarray,
    capacity: int,
    max_neighbors: int,
    min_cell_area: float,
    max_cell_area: float,
    intensity: Optional[jnp.ndarray],
    with_neighbors: bool,
    neighbor_compact_k: Optional[int],
) -> Tuple[CellTable, jnp.ndarray]:
    props = regionprops(labels, num_labels=capacity, intensity=intensity)
    exists = props["exists"].at[0].set(False)
    area = jnp.where(exists, props["area"], 0.0)[1:capacity + 1]
    exists_c = exists[1:capacity + 1]
    n_cells = jnp.maximum(jnp.sum(exists_c.astype(jnp.int32)), 1)
    mean_area = jnp.sum(area) / n_cells
    valid = (exists_c & (area < max_cell_area * mean_area)
             & (area > min_cell_area * mean_area)).astype(jnp.int32)
    overflow = jnp.asarray(False)
    if with_neighbors:
        # reference only inserts neighbor pairs whose window-max cell is valid
        working = jnp.concatenate([jnp.zeros((1,), bool), valid == 1])
        if neighbor_compact_k is not None:
            adj, overflow = adjacency_matrix_checked(
                labels, num_labels=capacity, working_mask=working,
                compact_k=neighbor_compact_k)
        else:
            adj = adjacency_matrix(labels, num_labels=capacity,
                                   working_mask=working)
        nbrs, counts = neighbor_lists(adj, max_neighbors=max_neighbors)
    else:
        nbrs = jnp.zeros((capacity + 1, max_neighbors), jnp.int32)
        counts = jnp.zeros((capacity + 1,), jnp.int32)
    bbox = jnp.stack([props["bbox_min_row"], props["bbox_min_col"],
                      props["bbox_max_row"], props["bbox_max_col"]], axis=1)
    seg_label = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    table = CellTable(
        area=area,
        perimeter=jnp.where(exists_c, props["perimeter"][1:], 0.0),
        label=jnp.where(exists_c, seg_label, 0),  # track id defaults to seg label
        cx=jnp.where(exists_c, props["cx"][1:], 0.0),
        cy=jnp.where(exists_c, props["cy"][1:], 0.0),
        valid=valid,
        type=jnp.zeros((capacity,), jnp.uint8),
        bbox=bbox[1:],
        empty_cell=(~exists_c).astype(jnp.int32),
        neighbors=nbrs[1:],
        n_neighbors=counts[1:],
    )
    return table, overflow
