"""Per-frame feature engine over cell tables.

TPU-native rebuild of the reference's feature dispatch (``Tissue.get_frame_data`` and
helpers, ``tissue_info.py:1035-1266,1610-1799,2563-2583``): every feature family is a
vectorized function over the padded CellTable + neighbor lists instead of per-cell
pandas loops.

Families (reference ``tissue_info.py:198-216``):
- SPECIAL  : psi6, shape index, roundness, neighbors-by-type (first/second order),
             contact lengths, mean intensity, distance from ablation
- GLOBAL   : density, type_fraction, total_area, number_of_cells,
             neighbors correlation (two methods)
- SPATIAL  : windowed density / type_fraction maps
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tissue_image_processing_tpu.core.cell_table import CellTable, is_positive_for_type

__all__ = [
    "roundness", "shape_index", "neighbors_adjacency", "n_neighbors_from_type",
    "second_order_neighbors_from_type", "psi_n", "total_area", "density",
    "type_fraction", "neighbors_correlation", "contact_lengths_by_type",
    "distance_from_points", "cells_inside_circle", "spatial_map",
]


def roundness(table: CellTable) -> jnp.ndarray:
    """4*pi*area/perimeter^2 (reference ``tissue_info.py:1610-1612``)."""
    p2 = jnp.maximum(table.perimeter ** 2, 1e-9)
    return 4.0 * jnp.pi * table.area / p2


def shape_index(table: CellTable) -> jnp.ndarray:
    """perimeter/sqrt(area) (reference ``tissue_info.py:1614-1616``)."""
    return table.perimeter / jnp.sqrt(jnp.maximum(table.area, 1e-9))


def neighbors_adjacency(table: CellTable) -> jnp.ndarray:
    """(N+1, N+1) bool adjacency from the padded neighbor lists."""
    n = table.capacity
    rows = jnp.repeat(jnp.arange(1, n + 1, dtype=jnp.int32)[:, None],
                      table.neighbors.shape[1], axis=1)
    cols = table.neighbors
    valid = cols > 0
    adj = jnp.zeros(((n + 1) * (n + 1),), bool)
    flat = jnp.where(valid, rows * (n + 1) + cols, 0)
    adj = adj.at[flat.ravel()].max(valid.ravel())
    adj = adj.at[0].set(False)
    return adj.reshape(n + 1, n + 1)


def _type_mask(table: CellTable, type_index, positive_for_type: bool) -> jnp.ndarray:
    pos = is_positive_for_type(table.type, type_index)
    return pos if positive_for_type else ~pos


def n_neighbors_from_type(table: CellTable, type_index=None,
                          positive_for_type: bool = True,
                          same_type: bool = False,
                          count_mode: str = "typed") -> jnp.ndarray:
    """Per-cell count of neighbors matching a type predicate (reference
    ``calculate_n_neighbors_from_type``, ``tissue_info.py:1752-1791``).

    count_mode: 'typed' (valid & non-empty & type predicate), 'all' (every listed
    neighbor), 'valid', or 'invalid'.
    """
    nbr = table.neighbors  # (N, K) labels
    has = nbr > 0
    idx = jnp.clip(nbr - 1, 0, table.capacity - 1)
    nbr_valid = (table.valid[idx] == 1) & (table.empty_cell[idx] == 0)
    if count_mode == "all":
        ok = has
    elif count_mode == "valid":
        ok = has & nbr_valid
    elif count_mode == "invalid":
        ok = has & (table.valid[idx] == 0) & (table.empty_cell[idx] == 0)
    else:
        if same_type:
            # each cell looks for neighbors positive for ITS own first type bits
            nbr_type = table.type[idx]
            own = table.type[:, None]
            match = (nbr_type & own) == own
            match = match & (nbr_type != 255) & (own != 255)
            ok = has & nbr_valid & (match if positive_for_type else ~match)
        else:
            tm = _type_mask(table, type_index, positive_for_type)
            ok = has & nbr_valid & tm[idx]
    return jnp.sum(ok.astype(jnp.int32), axis=1)


def second_order_neighbors_from_type(table: CellTable, type_index=None,
                                     positive_for_type: bool = True,
                                     count_all: bool = False) -> jnp.ndarray:
    """Count of second-order neighbors with a type predicate (reference
    ``find_second_order_neighbors``, ``tissue_info.py:2513-2543``): union of
    neighbors-of-valid-neighbors, self excluded, first-order retained (the
    reference's set.difference is a no-op)."""
    adj = neighbors_adjacency(table).astype(jnp.float32)
    valid1 = jnp.concatenate([jnp.zeros((1,), bool),
                              (table.valid == 1) & (table.empty_cell == 0)])
    mid = adj * valid1.astype(jnp.float32)[None, :]
    reach = jnp.dot(mid, adj, preferred_element_type=jnp.float32) > 0
    reach = reach & (~jnp.eye(table.capacity + 1, dtype=bool))
    if count_all:
        ok = reach & valid1[None, :]
    else:
        tm = _type_mask(table, type_index, positive_for_type)
        tm = jnp.concatenate([jnp.zeros((1,), bool), tm])
        ok = reach & valid1[None, :] & tm[None, :]
    return jnp.sum(ok[1:, 1:].astype(jnp.int32), axis=1)


def psi_n(table: CellTable, neighbor_sets: jnp.ndarray, n: int = 6) -> jnp.ndarray:
    """Bond-orientational order parameter psi_n (reference ``calc_psin``,
    ``tissue_info.py:2563-2583``): |sum_j exp(-i n theta_j)| / n_neighbors over the
    given (N, K) neighbor-label lists (typically Voronoi nearest HCs)."""
    idx = jnp.clip(neighbor_sets - 1, 0, table.capacity - 1)
    has = neighbor_sets > 0
    dy = table.cy[idx] - table.cy[:, None]
    dx = table.cx[idx] - table.cx[:, None]
    theta = jnp.arctan2(dy, dx)
    re = jnp.sum(jnp.where(has, jnp.cos(n * theta), 0.0), axis=1)
    im = jnp.sum(jnp.where(has, -jnp.sin(n * theta), 0.0), axis=1)
    cnt = jnp.maximum(jnp.sum(has.astype(jnp.float32), axis=1), 1.0)
    return jnp.sqrt(re ** 2 + im ** 2) / cnt


def total_area(table: CellTable, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    m = table.valid_mask() if mask is None else mask
    return jnp.sum(jnp.where(m, table.area, 0.0))


def density(table: CellTable, mask: jnp.ndarray,
            reference_area: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """cells per unit total area (reference ``calculate_density``,
    ``tissue_info.py:1622-1632``)."""
    if reference_area is None:
        reference_area = total_area(table, table.exists())
    n = jnp.sum(mask.astype(jnp.float32))
    return jnp.where(reference_area > 0, n / reference_area, 0.0)


def type_fraction(table: CellTable, mask: jnp.ndarray,
                  reference_count: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if reference_count is None:
        reference_count = jnp.sum(table.valid_mask().astype(jnp.float32))
    n = jnp.sum(mask.astype(jnp.float32))
    return jnp.where(reference_count > 0, n / reference_count, 0.0)


def neighbors_correlation(table: CellTable, state: jnp.ndarray,
                          mask: jnp.ndarray, method: str = "neighbors") -> jnp.ndarray:
    """Neighbor state-correlation (reference
    ``calculate_neighbors_correlation_function``, ``tissue_info.py:803-843``).

    state: (N,) float per-cell state (e.g. 1 for HC); mask: valid cells included.
    """
    sm = jnp.where(mask, state, 0.0)
    nm = jnp.sum(mask.astype(jnp.float32))
    avg = jnp.sum(sm) / jnp.maximum(nm, 1.0)
    var = jnp.sum(jnp.where(mask, (state - avg) ** 2, 0.0)) / jnp.maximum(nm, 1.0)
    nbr = table.neighbors
    idx = jnp.clip(nbr - 1, 0, table.capacity - 1)
    pair_ok = mask[:, None] & (nbr > 0) & mask[idx]
    if method == "neighbors":
        contrib = (state[idx] - avg) * (state[:, None] - avg)
        corr = jnp.sum(jnp.where(pair_ok, contrib, 0.0))
        cnt = jnp.sum(pair_ok.astype(jnp.float32))
        return corr / jnp.maximum(cnt * var, 1e-12)
    # neighbors average
    nbr_sum = jnp.sum(jnp.where(pair_ok, state[idx], 0.0), axis=1)
    nbr_cnt = jnp.sum(pair_ok.astype(jnp.float32), axis=1)
    nbr_avg = jnp.where(nbr_cnt > 0, nbr_sum / jnp.maximum(nbr_cnt, 1.0), 0.0)
    m2 = mask & (nbr_cnt > 0)
    nm2 = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    na_mean = jnp.sum(jnp.where(mask, nbr_avg, 0.0)) / nm2
    na_std = jnp.sqrt(jnp.sum(jnp.where(mask, (nbr_avg - na_mean) ** 2, 0.0)) / nm2)
    num = jnp.sum(jnp.where(mask, (state - avg) * (nbr_avg - na_mean), 0.0))
    return num / jnp.maximum(nm2 * jnp.sqrt(var) * na_std, 1e-12)


def contact_lengths_by_type(table: CellTable, contact_matrix: jnp.ndarray,
                            type_index=None, positive_for_type: bool = True,
                            all_types: bool = False) -> jnp.ndarray:
    """Per-cell total boundary contact with neighbors of a type (reference
    ``calculate_contact_length`` summed, ``tissue_info.py:1087-1096``)."""
    n = table.capacity
    if all_types:
        sel = jnp.ones((n,), bool)
    else:
        sel = _type_mask(table, type_index, positive_for_type)
    sel = sel & (table.empty_cell == 0)
    col_mask = jnp.concatenate([jnp.zeros((1,), bool), sel]).astype(jnp.float32)
    return (contact_matrix[1:, :] * col_mask[None, :]).sum(axis=1)


def distance_from_points(table: CellTable, points_yx: jnp.ndarray) -> jnp.ndarray:
    """Min distance from each cell centroid to any of the points (reference
    ``calculate_distance_from_ablation``, ``tissue_info.py:1168-1191``)."""
    dy = table.cy[:, None] - points_yx[None, :, 0]
    dx = table.cx[:, None] - points_yx[None, :, 1]
    return jnp.min(jnp.sqrt(dy ** 2 + dx ** 2), axis=1)


def cells_inside_circle(table: CellTable, center_yx, radius) -> jnp.ndarray:
    """(N,) mask of cells inside a circle (reference ``get_cells_inside_a_circle``,
    ``tissue_info.py:1262-1266``)."""
    dy = table.cy - center_yx[0]
    dx = table.cx - center_yx[1]
    return (dy ** 2 + dx ** 2) < radius ** 2


def spatial_map(table: CellTable, shape, window_radius: float, step_size: int,
                values: jnp.ndarray, mask: jnp.ndarray,
                feature: str = "mean") -> jnp.ndarray:
    """Windowed spatial map (reference ``calculate_spatial_data``,
    ``tissue_info.py:1239-1258``): a (H, W) map where each step_size block holds the
    windowed aggregate of ``values`` over cells within window_radius of the block
    center. feature: 'mean' | 'density' (count / total window area) |
    'fraction' (count(values>0)/count)."""
    H, W = shape
    gys = jnp.arange(step_size // 2, H, step_size, dtype=jnp.float32)
    gxs = jnp.arange(step_size // 2, W, step_size, dtype=jnp.float32)

    def at_point(gy, gx):
        inside = mask & ((table.cy - gy) ** 2 + (table.cx - gx) ** 2
                         < window_radius ** 2)
        cnt = jnp.sum(inside.astype(jnp.float32))
        if feature == "mean":
            return jnp.where(cnt > 0,
                             jnp.sum(jnp.where(inside, values, 0.0)) / jnp.maximum(cnt, 1.0),
                             0.0)
        if feature == "density":
            area = jnp.sum(jnp.where(inside, table.area, 0.0))
            sel = jnp.sum((inside & (values > 0)).astype(jnp.float32))
            return jnp.where(area > 0, sel / area, 0.0)
        # fraction
        sel = jnp.sum((inside & (values > 0)).astype(jnp.float32))
        return jnp.where(cnt > 0, sel / cnt, 0.0)

    grid = jax.vmap(lambda gy: jax.vmap(lambda gx: at_point(gy, gx))(gxs))(gys)
    # paint blocks
    up = jnp.repeat(jnp.repeat(grid, step_size, axis=0), step_size, axis=1)
    return up[:H, :W]


def voronoi_neighbor_lists(table: CellTable, mask: np.ndarray,
                           max_neighbors: int = 32) -> np.ndarray:
    """Nearest-neighbor sets from a Voronoi tessellation of the masked centroids
    (host-side scipy, reference ``find_nearest_neighbors_using_voroni_tesselation``,
    ``tissue_info.py:2545-2560``). Returns (N, K) padded label lists."""
    from scipy.spatial import Voronoi

    n = table.capacity
    out = np.zeros((n, max_neighbors), np.int32)
    idxs = np.nonzero(np.asarray(mask))[0]
    if idxs.size < 4:
        return out
    centers = np.stack([np.asarray(table.cx)[idxs], np.asarray(table.cy)[idxs]], 1)
    sets = [set() for _ in range(idxs.size)]
    vor = Voronoi(centers)
    for a, b in vor.ridge_points:
        sets[a].add(int(idxs[b]) + 1)
        sets[b].add(int(idxs[a]) + 1)
    for local_i, cell_i in enumerate(idxs):
        vals = sorted(sets[local_i])[:max_neighbors]
        out[cell_i, :len(vals)] = vals
    return out
