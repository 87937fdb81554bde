"""Pallas TPU kernels for the watershed flood — the hot loop of the pipeline.

The XLA formulation of the flood (ops/watershed.py) runs ~170 data-parallel sweeps;
each sweep re-reads/re-writes the full state from HBM (~30 elementwise passes), so a
1024^2 flood costs hundreds of ms. These kernels keep the ENTIRE state (flood levels,
labels, arrival steps) resident in VMEM across all sweeps, so each sweep touches HBM
zero times:

- ``bf_flood_pallas``: phase-1 Bellman-Ford flood levels (min-max semiring).
- ``settle_pallas``: phase-2 ascending settle with Meyer conflict->line semantics.

Both process the image in row blocks inside a single kernel launch; to keep pure
Jacobi (synchronous) semantics while updating in place, each sweep first snapshots the
rows on block boundaries and lets blocks read their out-of-block halo from the
snapshot. Semantics match ops/watershed.py exactly (asserted in tests on CPU via
interpret mode and against the XLA path).

VMEM budget: lam(f32) + lbl(i32) + t(i32) state refs = 12 B/px (48 MB at the
2048^2 cap), plus (block, W) working sets. Unaligned or larger images pad-and-crop
or fall back to the XLA path (ops/watershed.py).

Performance structure (measured at 1024^2 on v5e): sweeps are fixpoint
iterations whose count is set by content — plateau diameters for the CC
(~110), watershed-line chains for the settle (hundreds). The wins that matter:
sweep batching (8 per while iteration, convergence checked on the last only),
per-block activity flags that skip quiet blocks and halo refreshes in the
settle's long tail, and rank-by-diffusion relabeling (ops/watershed.py) instead
of 1M-element gathers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bf_flood_pallas", "settle_pallas", "settle_pallas_loop",
           "cc_diffusion_pallas", "pallas_flood_supported"]

_BLOCK = 64
# The settle kernel keeps ~14 live (block, W) vector values per block (3 state
# arrays + 12 shifted triples + 6 accumulators); smaller blocks cut register
# pressure AND give the activity flags finer skip granularity along the
# watershed-line chains (measured 8.1 ms at 32 vs 7.6 ms at 16 on 1024^2).
_SETTLE_BLOCK = 16
_MAX_SWEEPS = 4096
# Sweeps per while_loop iteration. The elementwise work of a sweep is ~0.01 ms;
# the measured ~0.07 ms/sweep came from the per-block jnp.any convergence
# reductions + loop-condition sync. These are monotone fixpoint iterations, so
# "the LAST sweep of a batch changed nothing" proves convergence — batches run
# reduction-free and only the final sweep computes `changed` (at most
# _SWEEP_BATCH-1 wasted no-op sweeps at the end).
_SWEEP_BATCH = 8
# The settle gates at batch granularity (see _settle_kernel); the batch must
# stay <= _SETTLE_BLOCK so activity cannot cross a block within one batch.
# 8 (not 16) keeps the unrolled program ~25% smaller than the round-2 version
# — the 2048^2-class compiles through the dev tunnel are the binding
# constraint, and the flag-scan amortization already happened at 8.
_SETTLE_SWEEP_BATCH = 8
# v5e/v4 have far more physical VMEM than Mosaic's 16 MB default scoped limit. At
# the 2048^2 cap the settle kernel holds lam+lbl+t state (48 MB) + halo snapshots
# + per-block temporaries ~= 60 MB; 112 MB leaves headroom under the 128 MB core.
_VMEM_LIMIT = 112 * 1024 * 1024


def pallas_flood_supported(shape) -> bool:
    """Exact-shape gate: row blocks of 64, lane-aligned width, state fits VMEM
    (cap 4352x1024 px ~= 4.45 M: settle holds 12 B/px in + 8 B/px out + halos
    ~= 96 MB under the 112 MB limit; 2048^2 = 4.19 M also fits). Unaligned
    shapes pad-and-crop one level up (ops/watershed.py) rather than falling to
    the ~10x slower XLA sweep path; frame batches stack rows (watershed_batch)."""
    H, W = shape
    return (H % _BLOCK == 0) and (W % 128 == 0) and H * W <= 4352 * 1024 and W <= 2048


def _shift_rows(x, down: bool, edge):
    """Shift a (rows, W) block by one row; vacated row filled with ``edge`` row."""
    if down:   # out[r] = x[r-1]
        return jnp.concatenate([edge[None, :], x[:-1]], axis=0)
    return jnp.concatenate([x[1:], edge[None, :]], axis=0)


def _shift_cols(x, right: bool, fill):
    if right:  # out[:, c] = x[:, c-1]
        return jnp.concatenate([jnp.full((x.shape[0], 1), fill, x.dtype),
                                x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:],
                            jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1)


def _bf_kernel(img_ref, lam_in_ref, lam_ref, halo_ref, flags_ref, nflags_ref):
    """lam <- min(lam, max(shift(lam), img)) iterated to fixpoint, in VMEM.

    Per-block activity flags at BATCH granularity: a block runs a batch only
    if it or a row-neighbor changed during the previous batch. Change is
    detected on the batch's LAST sweep only (per-block jnp.any — the same
    reduction the ungated kernel already paid): a block quiet on the last
    sweep is at a local fixpoint for its current halo, and any future halo
    change first sets a neighbor's flag, which re-activates this block one
    batch later (monotone updates, so delayed re-activation converges to the
    same fixpoint)."""
    H, W = img_ref.shape
    n_blocks = H // _BLOCK
    inf = jnp.float32(jnp.inf)
    # explicit copy-in: a no-op when the input/output alias is honored, and the
    # only correct initialization when it is not — on real TPUs the aliased
    # output buffer has been observed arriving UNFILLED (reusing another
    # kernel's dead buffer) at some sizes, which leaks sentinels downstream
    for b in range(n_blocks):
        r0 = b * _BLOCK
        lam_ref[pl.ds(r0, _BLOCK), :] = lam_in_ref[pl.ds(r0, _BLOCK), :]
        flags_ref[b] = jnp.int32(1)

    def sweep_batch(carry):
        _, it = carry
        # stash run-decisions first (they read flags of BOTH neighbors), then
        # zero flags — the last sweep re-sets them for still-active blocks
        for b in range(n_blocks):
            near = flags_ref[b]
            if b > 0:
                near = near + flags_ref[b - 1]
            if b < n_blocks - 1:
                near = near + flags_ref[b + 1]
            nflags_ref[b] = near
        for b in range(n_blocks):
            flags_ref[b] = jnp.int32(0)
        for s in range(_SWEEP_BATCH):
            last = s == _SWEEP_BATCH - 1
            # snapshot block-boundary halo rows (pre-sweep) for Jacobi semantics
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _halo(b=b):
                    halo_ref[2 * b, :] = lam_ref[b * _BLOCK, :]
                    halo_ref[2 * b + 1, :] = lam_ref[(b + 1) * _BLOCK - 1, :]
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _run(b=b, last=last):
                    r0 = b * _BLOCK
                    lam = lam_ref[pl.ds(r0, _BLOCK), :]
                    img = img_ref[pl.ds(r0, _BLOCK), :]
                    up_edge = halo_ref[2 * b - 1, :] if b > 0 \
                        else jnp.full((W,), inf)
                    dn_edge = halo_ref[2 * b + 2, :] if b < n_blocks - 1 \
                        else jnp.full((W,), inf)
                    cand = jnp.minimum(
                        jnp.minimum(_shift_rows(lam, True, up_edge),
                                    _shift_rows(lam, False, dn_edge)),
                        jnp.minimum(_shift_cols(lam, True, inf),
                                    _shift_cols(lam, False, inf)))
                    new = jnp.minimum(lam, jnp.maximum(cand, img))
                    if last:
                        flags_ref[b] = jnp.any(new < lam).astype(jnp.int32)
                    lam_ref[pl.ds(r0, _BLOCK), :] = new
        changed = flags_ref[0] > 0
        for b in range(1, n_blocks):
            changed = changed | (flags_ref[b] > 0)
        return changed, it + _SWEEP_BATCH

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), sweep_batch,
                       (jnp.bool_(True), jnp.int32(0)))


@jax.jit
def bf_flood_pallas(img: jnp.ndarray, seeds: jnp.ndarray) -> jnp.ndarray:
    """Flood levels lam = minimax path elevation from any seed (phase 1)."""
    H, W = img.shape
    lam0 = jnp.where(seeds > 0, img, jnp.inf).astype(jnp.float32)
    return pl.pallas_call(
        _bf_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * (H // _BLOCK), W), jnp.float32),
                        pltpu.SMEM((H // _BLOCK,), jnp.int32),
                        pltpu.SMEM((H // _BLOCK,), jnp.int32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(img.astype(jnp.float32), lam0)


def _cc_kernel(mask_ref, lbl_in_ref, lbl_ref, halo_ref, flags_ref, nflags_ref):
    """Min-index diffusion over a mask: connected components by propagation, all in
    VMEM (pointer jumping needs big gathers, which run at ~300 MB/s on this TPU —
    plateau diameters here are cell-sized, so diffusion sweeps win). Same
    batch-granular per-block activity gating as ``_bf_kernel``."""
    H, W = mask_ref.shape
    n_blocks = H // _BLOCK
    INF = jnp.int32(H * W)
    # explicit copy-in (see _bf_kernel: aliased outputs can arrive unfilled)
    for b in range(n_blocks):
        r0 = b * _BLOCK
        lbl_ref[pl.ds(r0, _BLOCK), :] = lbl_in_ref[pl.ds(r0, _BLOCK), :]
        flags_ref[b] = jnp.int32(1)

    def sweep_batch(carry):
        _, it = carry
        for b in range(n_blocks):
            near = flags_ref[b]
            if b > 0:
                near = near + flags_ref[b - 1]
            if b < n_blocks - 1:
                near = near + flags_ref[b + 1]
            nflags_ref[b] = near
        for b in range(n_blocks):
            flags_ref[b] = jnp.int32(0)
        for s in range(_SWEEP_BATCH):
            last = s == _SWEEP_BATCH - 1
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _halo(b=b):
                    halo_ref[2 * b, :] = lbl_ref[b * _BLOCK, :]
                    halo_ref[2 * b + 1, :] = lbl_ref[(b + 1) * _BLOCK - 1, :]
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _run(b=b, last=last):
                    r0 = b * _BLOCK
                    lbl = lbl_ref[pl.ds(r0, _BLOCK), :]
                    mask = mask_ref[pl.ds(r0, _BLOCK), :] > 0
                    up_edge = halo_ref[2 * b - 1, :] if b > 0 \
                        else jnp.full((W,), INF)
                    dn_edge = halo_ref[2 * b + 2, :] if b < n_blocks - 1 \
                        else jnp.full((W,), INF)
                    cand = jnp.minimum(
                        jnp.minimum(_shift_rows(lbl, True, up_edge),
                                    _shift_rows(lbl, False, dn_edge)),
                        jnp.minimum(_shift_cols(lbl, True, INF),
                                    _shift_cols(lbl, False, INF)))
                    new = jnp.where(mask, jnp.minimum(lbl, cand), INF)
                    if last:
                        flags_ref[b] = jnp.any(new < lbl).astype(jnp.int32)
                    lbl_ref[pl.ds(r0, _BLOCK), :] = new
        changed = flags_ref[0] > 0
        for b in range(1, n_blocks):
            changed = changed | (flags_ref[b] > 0)
        return changed, it + _SWEEP_BATCH

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), sweep_batch,
                       (jnp.bool_(True), jnp.int32(0)))


@jax.jit
def cc_diffusion_pallas(mask: jnp.ndarray, init: jnp.ndarray | None = None
                        ) -> jnp.ndarray:
    """4-connected component labels by min-diffusion: each component gets the MIN of
    its pixels' initial values (-1 outside the mask). With the default init (the flat
    pixel index) that is the root/top-left index. A custom ``init`` lets callers fold
    component-wide predicates into the same kernel — e.g. regional_minima_labels
    seeds escaping-plateau pixels with (idx - n) so any poisoned component surfaces
    as a negative value, replacing a separate scatter-table membership test."""
    H, W = mask.shape
    n = H * W
    idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    base = idx if init is None else init.astype(jnp.int32)
    lbl0 = jnp.where(mask, base, jnp.int32(n))
    lbl = pl.pallas_call(
        _cc_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * (H // _BLOCK), W), jnp.int32),
                        pltpu.SMEM((H // _BLOCK,), jnp.int32),
                        pltpu.SMEM((H // _BLOCK,), jnp.int32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mask.astype(jnp.int32), lbl0)
    return jnp.where(mask, lbl, -1)


def _settle_kernel(lam_ref, lbl_in_ref, t_in_ref, lbl_ref, t_ref,
                   lam_halo, lbl_halo, t_halo, flags_ref, nflags_ref):
    """Ascending settle (Meyer pop order) with conflict->line, all state in VMEM.

    lbl encoding: 0 = unsettled, k>0 = settled label k, -1 = settled line,
    -2 = settled void.

    Per-block skip flags: a block whose own rows and both neighbor blocks
    settled nothing last sweep cannot settle anything this sweep (its update
    depends only on its rows plus a one-row halo), so it is skipped via
    ``pl.when`` — EXACTLY the same output (``it`` advances globally). The
    settle's sweep count is set by watershed-LINE chains that crawl one pixel
    per sweep along cell perimeters (hundreds of sweeps on 1024^2 membranes);
    most blocks go quiet after a few dozen sweeps, so late sweeps touch only
    the 2-3 blocks still carrying a chain.
    """
    H, W = lam_ref.shape
    n_blocks = H // _SETTLE_BLOCK
    inf = jnp.float32(jnp.inf)
    big_t = jnp.int32(1 << 29)

    # explicit copy-in (see _bf_kernel: aliased outputs can arrive unfilled)
    for b in range(n_blocks):
        r0 = b * _SETTLE_BLOCK
        lbl_ref[pl.ds(r0, _SETTLE_BLOCK), :] = lbl_in_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        t_ref[pl.ds(r0, _SETTLE_BLOCK), :] = t_in_ref[pl.ds(r0, _SETTLE_BLOCK), :]
    # lam is constant during the settle: snapshot its halo rows once
    for b in range(n_blocks):
        lam_halo[2 * b, :] = lam_ref[b * _SETTLE_BLOCK, :]
        lam_halo[2 * b + 1, :] = lam_ref[(b + 1) * _SETTLE_BLOCK - 1, :]
        flags_ref[b] = jnp.int32(1)

    def _block_body(b, r0, it):
        lam = lam_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        lbl = lbl_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        t = t_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        settled = lbl != 0

        if b > 0:
            up = (lam_halo[2 * b - 1, :], lbl_halo[2 * b - 1, :],
                  t_halo[2 * b - 1, :])
        else:
            up = (jnp.full((W,), inf), jnp.zeros((W,), jnp.int32),
                  jnp.full((W,), big_t))
        if b < n_blocks - 1:
            dn = (lam_halo[2 * b + 2, :], lbl_halo[2 * b + 2, :],
                  t_halo[2 * b + 2, :])
        else:
            dn = (jnp.full((W,), inf), jnp.zeros((W,), jnp.int32),
                  jnp.full((W,), big_t))

        nbrs = [
            (_shift_rows(lam, True, up[0]), _shift_rows(lbl, True, up[1]),
             _shift_rows(t, True, up[2])),
            (_shift_rows(lam, False, dn[0]), _shift_rows(lbl, False, dn[1]),
             _shift_rows(t, False, dn[2])),
            (_shift_cols(lam, True, inf), _shift_cols(lbl, True, 0),
             _shift_cols(t, True, big_t)),
            (_shift_cols(lam, False, inf), _shift_cols(lbl, False, 0),
             _shift_cols(t, False, big_t)),
        ]
        ready = jnp.ones_like(settled)
        all_eq = jnp.ones_like(settled)
        best_v = jnp.full((_SETTLE_BLOCK, W), inf, jnp.float32)
        best_t = jnp.full((_SETTLE_BLOCK, W), big_t, jnp.int32)
        best_l = jnp.zeros((_SETTLE_BLOCK, W), jnp.int32)
        minl = jnp.full((_SETTLE_BLOCK, W), jnp.int32((1 << 30)), jnp.int32)
        maxl = jnp.zeros((_SETTLE_BLOCK, W), jnp.int32)
        for qv, ql, qt in nbrs:
            qsettled = ql != 0
            ready = ready & ((~(qv < lam)) | qsettled)
            all_eq = all_eq & ((~(qv <= lam)) | qsettled)
            donor = (ql > 0) & (qv <= lam)
            minl = jnp.where(donor, jnp.minimum(minl, ql), minl)
            maxl = jnp.where(donor, jnp.maximum(maxl, ql), maxl)
            better = donor & ((qv < best_v) | ((qv == best_v) & (qt < best_t)))
            best_v = jnp.where(better, qv, best_v)
            best_t = jnp.where(better, qt, best_t)
            best_l = jnp.where(better, ql, best_l)
        has_donor = maxl > 0
        conflict = has_donor & (minl != maxl)
        unsettled = ~settled
        settle_lbl = unsettled & ready & has_donor & (~conflict)
        settle_line = unsettled & ready & conflict
        settle_void = unsettled & ready & (~has_donor) & all_eq
        can = settle_lbl | settle_line | settle_void
        new_lbl = jnp.where(
            settle_lbl, best_l,
            jnp.where(settle_line, -1, jnp.where(settle_void, -2, lbl)))
        lbl_ref[pl.ds(r0, _SETTLE_BLOCK), :] = new_lbl
        t_ref[pl.ds(r0, _SETTLE_BLOCK), :] = jnp.where(can, it, t)
        # accumulate "settled something this batch" (flags_ref was zeroed at
        # batch start; nflags_ref holds the batch's run decisions)
        flags_ref[b] = flags_ref[b] | jnp.any(can).astype(jnp.int32)

    def sweep_batch(carry):
        _, it0 = carry
        # BATCH-granular gating (the per-sweep 3x n_blocks scalar flag loops
        # were several ms of the settle at ~600 sweeps): the active set for the
        # whole batch is {b : b or a row-neighbor settled something during the
        # previous batch}. Exact: a skipped block ran its previous batch to a
        # local fixpoint under halos that have not changed since (its neighbors
        # settled nothing either), so it could not have settled anything in the
        # skipped sweeps — hence the global `it` stamps are unaffected.
        # Activity cannot cross a skipped (frozen) block, and it reaches <=
        # _SETTLE_SWEEP_BATCH (16) rows <= _SETTLE_BLOCK into a running
        # neighbor per batch, whose accumulated flag then re-activates this
        # block one batch later. Flags accumulate over ALL sweeps of the batch
        # (nflags_ref), not just the last — a mid-batch settle must wake the
        # neighbors.
        for b in range(n_blocks):
            near = flags_ref[b]
            if b > 0:
                near = near + flags_ref[b - 1]
            if b < n_blocks - 1:
                near = near + flags_ref[b + 1]
            nflags_ref[b] = near
        for b in range(n_blocks):
            flags_ref[b] = jnp.int32(0)
        for s in range(_SETTLE_SWEEP_BATCH):
            it = it0 + s  # arrival stamps still advance once per SWEEP
            for b in range(n_blocks):
                # block b's halo rows are read by b+-1; a frozen block's rows
                # cannot change, so only running blocks refresh their snapshot
                @pl.when(nflags_ref[b] > 0)
                def _copy_halo(b=b):
                    lbl_halo[2 * b, :] = lbl_ref[b * _SETTLE_BLOCK, :]
                    lbl_halo[2 * b + 1, :] = lbl_ref[(b + 1) * _SETTLE_BLOCK - 1, :]
                    t_halo[2 * b, :] = t_ref[b * _SETTLE_BLOCK, :]
                    t_halo[2 * b + 1, :] = t_ref[(b + 1) * _SETTLE_BLOCK - 1, :]
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _run(b=b, it=it):
                    _block_body(b, b * _SETTLE_BLOCK, it)
        changed = flags_ref[0] > 0
        for b in range(1, n_blocks):
            changed = changed | (flags_ref[b] > 0)
        return changed, it0 + _SETTLE_SWEEP_BATCH

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), sweep_batch,
                       (jnp.bool_(True), jnp.int32(1)))


def _settle_loop_kernel(lam_ref, lbl_in_ref, t_in_ref, lbl_ref, t_ref,
                        lam_halo, lbl_halo, t_halo, flags_ref, run_ref,
                        cnt_ref):
    """Dynamic-block-index variant of ``_settle_kernel``: the same math, but
    blocks are visited via ``lax.fori_loop`` over a compact ACTIVE LIST built
    once per batch, so the compiled program is O(1) in H — the unrolled
    kernel's Mosaic compile time grows with n_blocks and becomes the binding
    constraint at 2048^2-class and stacked-frame shapes (tens of minutes via
    the dev tunnel), while quiet blocks here cost nothing at all (not even a
    flag check per sweep).

    Index scheme (avoids b==0 / b==n-1 Python specializations):
    - halo row arrays are (2n+2, W) with sentinel rows [0] and [2n+1]
      (lam=+inf, lbl=0, t=big); block b's rows live at [2b+1], [2b+2], so its
      up/dn halos are [2b] / [2b+3] unconditionally.
    - flags are (n+2,) with zero sentinels; block b's flag at [b+1].
    """
    H, W = lam_ref.shape
    n_blocks = H // _SETTLE_BLOCK
    inf = jnp.float32(jnp.inf)
    big_t = jnp.int32(1 << 29)

    def init_b(b, _):
        r0 = b * _SETTLE_BLOCK
        lbl_ref[pl.ds(r0, _SETTLE_BLOCK), :] = lbl_in_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        t_ref[pl.ds(r0, _SETTLE_BLOCK), :] = t_in_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        lam_halo[2 * b + 1, :] = lam_ref[r0, :]
        lam_halo[2 * b + 2, :] = lam_ref[r0 + _SETTLE_BLOCK - 1, :]
        flags_ref[b + 1] = jnp.int32(1)
        return 0

    jax.lax.fori_loop(0, n_blocks, init_b, 0)
    lam_halo[0, :] = jnp.full((W,), inf)
    lam_halo[2 * n_blocks + 1, :] = jnp.full((W,), inf)
    lbl_halo[0, :] = jnp.zeros((W,), jnp.int32)
    lbl_halo[2 * n_blocks + 1, :] = jnp.zeros((W,), jnp.int32)
    t_halo[0, :] = jnp.full((W,), big_t)
    t_halo[2 * n_blocks + 1, :] = jnp.full((W,), big_t)
    flags_ref[0] = jnp.int32(0)
    flags_ref[n_blocks + 1] = jnp.int32(0)

    def _block_body(b, it):
        r0 = b * _SETTLE_BLOCK
        lam = lam_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        lbl = lbl_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        t = t_ref[pl.ds(r0, _SETTLE_BLOCK), :]
        settled = lbl != 0
        up = (lam_halo[2 * b, :], lbl_halo[2 * b, :], t_halo[2 * b, :])
        dn = (lam_halo[2 * b + 3, :], lbl_halo[2 * b + 3, :],
              t_halo[2 * b + 3, :])
        nbrs = [
            (_shift_rows(lam, True, up[0]), _shift_rows(lbl, True, up[1]),
             _shift_rows(t, True, up[2])),
            (_shift_rows(lam, False, dn[0]), _shift_rows(lbl, False, dn[1]),
             _shift_rows(t, False, dn[2])),
            (_shift_cols(lam, True, inf), _shift_cols(lbl, True, 0),
             _shift_cols(t, True, big_t)),
            (_shift_cols(lam, False, inf), _shift_cols(lbl, False, 0),
             _shift_cols(t, False, big_t)),
        ]
        ready = jnp.ones_like(settled)
        all_eq = jnp.ones_like(settled)
        best_v = jnp.full((_SETTLE_BLOCK, W), inf, jnp.float32)
        best_t = jnp.full((_SETTLE_BLOCK, W), big_t, jnp.int32)
        best_l = jnp.zeros((_SETTLE_BLOCK, W), jnp.int32)
        minl = jnp.full((_SETTLE_BLOCK, W), jnp.int32((1 << 30)), jnp.int32)
        maxl = jnp.zeros((_SETTLE_BLOCK, W), jnp.int32)
        for qv, ql, qt in nbrs:
            qsettled = ql != 0
            ready = ready & ((~(qv < lam)) | qsettled)
            all_eq = all_eq & ((~(qv <= lam)) | qsettled)
            donor = (ql > 0) & (qv <= lam)
            minl = jnp.where(donor, jnp.minimum(minl, ql), minl)
            maxl = jnp.where(donor, jnp.maximum(maxl, ql), maxl)
            better = donor & ((qv < best_v) | ((qv == best_v) & (qt < best_t)))
            best_v = jnp.where(better, qv, best_v)
            best_t = jnp.where(better, qt, best_t)
            best_l = jnp.where(better, ql, best_l)
        has_donor = maxl > 0
        conflict = has_donor & (minl != maxl)
        unsettled = ~settled
        settle_lbl = unsettled & ready & has_donor & (~conflict)
        settle_line = unsettled & ready & conflict
        settle_void = unsettled & ready & (~has_donor) & all_eq
        can = settle_lbl | settle_line | settle_void
        new_lbl = jnp.where(
            settle_lbl, best_l,
            jnp.where(settle_line, -1, jnp.where(settle_void, -2, lbl)))
        lbl_ref[pl.ds(r0, _SETTLE_BLOCK), :] = new_lbl
        t_ref[pl.ds(r0, _SETTLE_BLOCK), :] = jnp.where(can, it, t)
        flags_ref[b + 1] = flags_ref[b + 1] | jnp.any(can).astype(jnp.int32)

    def sweep_batch(carry):
        _, it0 = carry
        # build the batch's active list from last batch's accumulated flags
        # (same exactness argument as _settle_kernel's batch gating)
        def scan_b(b, cnt):
            near = flags_ref[b] + flags_ref[b + 1] + flags_ref[b + 2]

            def app(c):
                run_ref[c] = b
                return c + 1

            return jax.lax.cond(near > 0, app, lambda c: c, cnt)

        cnt = jax.lax.fori_loop(0, n_blocks, scan_b, jnp.int32(0))

        def clear_b(b, _):
            flags_ref[b + 1] = jnp.int32(0)
            return 0

        jax.lax.fori_loop(0, n_blocks, clear_b, 0)
        for s in range(_SETTLE_SWEEP_BATCH):
            it = it0 + s

            def halo_i(i, _):
                b = run_ref[i]
                r0 = b * _SETTLE_BLOCK
                lbl_halo[2 * b + 1, :] = lbl_ref[r0, :]
                lbl_halo[2 * b + 2, :] = lbl_ref[r0 + _SETTLE_BLOCK - 1, :]
                t_halo[2 * b + 1, :] = t_ref[r0, :]
                t_halo[2 * b + 2, :] = t_ref[r0 + _SETTLE_BLOCK - 1, :]
                return 0

            jax.lax.fori_loop(0, cnt, halo_i, 0)

            def run_i(i, _):
                _block_body(run_ref[i], it)
                return 0

            jax.lax.fori_loop(0, cnt, run_i, 0)

        def or_b(b, a):
            return a | flags_ref[b + 1]

        changed = jax.lax.fori_loop(0, n_blocks, or_b, jnp.int32(0))
        cnt_ref[0] = cnt  # debug/occupancy visibility
        return changed > 0, it0 + _SETTLE_SWEEP_BATCH

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), sweep_batch,
                       (jnp.bool_(True), jnp.int32(1)))


@jax.jit
def settle_pallas_loop(lam: jnp.ndarray, seeds: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``settle_pallas`` built on the O(1)-program-size loop kernel."""
    H, W = lam.shape
    big_t = jnp.int32(1 << 29)
    lbl0 = seeds.astype(jnp.int32)
    t0 = jnp.where(seeds > 0, 0, big_t).astype(jnp.int32)
    n_blocks = H // _SETTLE_BLOCK
    lbl, t = pl.pallas_call(
        _settle_loop_kernel,
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.float32),
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.int32),
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.int32),
            pltpu.SMEM((n_blocks + 2,), jnp.int32),
            pltpu.SMEM((n_blocks,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(lam.astype(jnp.float32), lbl0, t0)
    return lbl, t


@jax.jit
def settle_pallas(lam: jnp.ndarray, seeds: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase-2 settle. Returns (lbl, t): lbl>0 labels, -1 line, -2 void, 0 unreached;
    t = arrival sweep (for the post-pass line tie-breaks)."""
    H, W = lam.shape
    big_t = jnp.int32(1 << 29)
    lbl0 = seeds.astype(jnp.int32)
    t0 = jnp.where(seeds > 0, 0, big_t).astype(jnp.int32)
    lbl, t = pl.pallas_call(
        _settle_kernel,
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2 * (H // _SETTLE_BLOCK), W), jnp.float32),
            pltpu.VMEM((2 * (H // _SETTLE_BLOCK), W), jnp.int32),
            pltpu.VMEM((2 * (H // _SETTLE_BLOCK), W), jnp.int32),
            pltpu.SMEM((H // _SETTLE_BLOCK,), jnp.int32),
            pltpu.SMEM((H // _SETTLE_BLOCK,), jnp.int32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(lam.astype(jnp.float32), lbl0, t0)
    return lbl, t
