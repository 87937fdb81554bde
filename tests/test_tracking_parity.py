"""Lineage parity vs the exact adaptive Crocker-Grier oracle at bench-like
density, with the churn that produced rounds 2-3's 0.992 plateau.

Root cause of that plateau (VERDICT r3 item 8, reproduced and classified
here): per-FRAME scalar adaptive radii apply trackpy's subnet shrink to every
cell, but trackpy shrinks only the oversized subnet — small subnets keep the
nominal radius (their links beyond the shrunk radius survive) AND the nominal
null-link cost (which changes the optimal assignment even for short links).
``adaptive_effective_ranges(per_cell=True)`` mirrors the recursion exactly;
the residual after the fix is near-tie split/churn ambiguity (cost well under
the radius, alternate optima of equal total cost).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tissue_image_processing_tpu.core.tracking import (
    adaptive_effective_ranges, track_movie)
from oracles import crocker_grier_link


def churny_frames(T=8, H=1024, W=1024, n=760, seed=1, N=1024):
    """Bench-density drifting points with FOV border churn, over-segmentation
    splits and 12% area noise — the structure that separates per-frame from
    per-cell radii."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-40, H + 40, n), rng.uniform(-40, W + 40, n)], 1)
    areas0 = rng.uniform(600, 3200, n)
    frames, cys, cxs, ars, masks = [], [], [], [], []
    for t in range(T):
        pts += np.array([3.0, -2.0]) + rng.normal(0, 0.8, (n, 2))
        a = areas0 * (1 + 0.12 * rng.standard_normal(n))
        inside = ((pts[:, 0] > 0) & (pts[:, 0] < H)
                  & (pts[:, 1] > 0) & (pts[:, 1] < W))
        split = (rng.random(n) < 0.015) & inside
        sy = pts[split] + rng.normal(0, 8, (split.sum(), 2))
        rows = np.nonzero(inside)[0]
        cy = np.concatenate([pts[rows, 0], sy[:, 0]])
        cx = np.concatenate([pts[rows, 1], sy[:, 1]])
        ar = np.concatenate([a[rows], a[split] * 0.5])
        m = cy.size
        CY, CX, AR = np.zeros(N), np.zeros(N), np.zeros(N)
        MK = np.zeros(N, bool)
        CY[:m], CX[:m], AR[:m], MK[:m] = cy, cx, ar, True
        frames.append((cy.copy(), cx.copy(), ar.copy()))
        cys.append(CY), cxs.append(CX), ars.append(AR), masks.append(MK)
    return frames, *(np.array(x) for x in (cys, cxs, ars, masks))


def links_of(ids):
    last, out = {}, set()
    for t in range(ids.shape[0]):
        for i, v in enumerate(ids[t]):
            v = int(v)
            if v == 0:
                continue
            if v in last:
                out.add((*last[v], t, i))
            last[v] = (t, i)
    return out


@pytest.mark.slow
def test_per_cell_adaptive_radii_close_the_parity_residual():
    frames, cys, cxs, ars, masks = churny_frames()
    T, N = cys.shape
    orc = crocker_grier_link(frames)
    ids_orc = np.zeros((T, N), np.int64)
    for t in range(T):
        ids_orc[t, :len(orc[t])] = orc[t]
    L_orc = links_of(ids_orc)

    def run(ranges):
        return np.asarray(track_movie(
            jnp.asarray(cys, jnp.float32), jnp.asarray(cxs, jnp.float32),
            jnp.asarray(ars, jnp.float32), jnp.asarray(masks),
            capacity=2 * N, search_ranges=jnp.asarray(ranges, jnp.float32)))

    r_frame = adaptive_effective_ranges(cys, cxs, ars, masks)
    r_cell = adaptive_effective_ranges(cys, cxs, ars, masks, per_cell=True)
    par_frame = len(links_of(run(r_frame)) & L_orc) / len(L_orc)
    L_pc = links_of(run(r_cell))
    par_cell = len(L_pc & L_orc) / len(L_orc)
    print(f"\nparity per-frame {par_frame:.4f} -> per-cell {par_cell:.4f}")
    assert par_cell >= 0.995, par_cell
    assert par_cell > par_frame
    # every remaining miss is a near-tie (cost well inside its radius), not a
    # gating error: the class the oracle itself resolves arbitrarily
    for (t0, i0, t1, i1) in L_orc - L_pc:
        d2 = ((cys[t1, i1] - cys[t0, i0]) ** 2 + (cxs[t1, i1] - cxs[t0, i0]) ** 2
              + 0.5 * (np.sqrt(ars[t1, i1]) - np.sqrt(ars[t0, i0])) ** 2)
        assert np.sqrt(d2) < r_cell[t1, i1], "radius-gated miss survived"


def test_per_cell_radii_small():
    """Per-cell mode: isolated cells keep the nominal radius while a planted
    dense cluster shrinks — per-frame mode wrongly shrinks everyone."""
    rng = np.random.default_rng(0)
    T, N = 2, 256
    # 40 isolated cells on a loose grid + 60 clustered in a 60-px blob
    iso = np.stack([rng.uniform(0, 900, 40), rng.uniform(0, 900, 40)], 1)
    blob = 950 + rng.uniform(0, 60, (60, 2))
    pts = np.concatenate([iso, blob])
    cys = np.zeros((T, N)); cxs = np.zeros((T, N))
    ars = np.zeros((T, N)); mks = np.zeros((T, N), bool)
    for t in range(T):
        p = pts + t * 2.0
        m = p.shape[0]
        cys[t, :m], cxs[t, :m] = p[:, 0], p[:, 1]
        ars[t, :m], mks[t, :m] = 1000.0, True
    r = adaptive_effective_ranges(cys, cxs, ars, mks, subnet_limit=30,
                                  per_cell=True)
    assert r.shape == (T, N)
    assert np.all(r[1, :40] == 100.0), "isolated cells must keep the nominal radius"
    assert np.all(r[1, 40:100] < 100.0), "the oversized blob must shrink"
    # scalar mode shrinks the whole frame
    r_sc = adaptive_effective_ranges(cys, cxs, ars, mks, subnet_limit=30)
    assert r_sc[1] < 100.0
