"""Pallas TPU kernels for the watershed flood — the hot loop of the pipeline.

The XLA formulation of the flood (ops/watershed.py) runs ~170 data-parallel sweeps;
each sweep re-reads/re-writes the full state from HBM (~30 elementwise passes), so a
1024^2 flood costs hundreds of ms. These kernels keep the ENTIRE state (flood levels,
labels, arrival steps) resident in VMEM across all sweeps, so each sweep touches HBM
zero times:

- ``bf_flood_pallas``: phase-1 Bellman-Ford flood levels (min-max semiring).
- ``settle_pallas``: phase-2 ascending settle with Meyer conflict->line semantics.

All kernels share one structure: the image is split into row blocks; each
8-sweep BATCH visits only the ACTIVE blocks (a block runs iff it or a
row-neighbor changed during the previous batch — exact, see the kernel
docstrings). Three equivalent execution forms, chosen by size and phase:

- an ungated static BULK prologue (``_*_bulk_kernel``) runs the first
  ``_BULK_SWEEPS`` sweeps as straight-line code — in that phase every block
  is genuinely active, so gating machinery is pure overhead;
- a fully-unrolled gated form for small block counts (BF/CC at
  <= _UNROLL_MAX_BLOCKS blocks);
- a gated ``lax.fori_loop`` over a compact active list with dynamic block
  indices whose compiled program is O(1) in H — load-bearing for big shapes:
  unrolled gated code made Mosaic compile time grow superlinearly with block
  count (minutes at 64 blocks, effectively unbounded at the 2048^2 /
  stacked-frame shapes, through a dev tunnel where every compile is remote).

All splits are bit-identical (asserted in tests): any prefix of Jacobi
sweeps is the same no matter which kernel runs it, and the updates are
monotone so extra visits to converged blocks are no-ops. Jacobi semantics
with in-place updates come from per-sweep snapshots of block-boundary halo
rows; sentinel halo rows at the image border remove edge-block special cases.
Semantics match ops/watershed.py exactly (asserted in tests on CPU via
interpret mode and against the XLA path).

VMEM budget: lam(f32) + lbl(i32) + t(i32) state refs = 12 B/px (48 MB at the
2048^2 cap), plus (block, W) working sets. Unaligned or larger images pad-and-crop
or fall back to the XLA path (ops/watershed.py).

Performance structure (measured at 1024^2/2048^2 on v5e): the settle's arrival
stamps show max ~160-175 sweeps with p50 = 24, p90 = 50 — most sweeps happen
in a mid-phase where many blocks are still active, so per-block-sweep overhead
(halo row copies, loop control, reductions) matters as much as the vector
work. The wins that got the settle to 18.9 ms at 2048^2 (from ~32 ms):
sweep batching (8 per while iteration), the precomputed lam-comparison
bitmask (_settle_mask: kernels carry no lam state, no lam halos, bit tests
instead of f32 compares), last-sweep-only convergence flags in the gated
tails, and rank-by-diffusion relabeling (ops/watershed.py) instead of
1M-element gathers. Sub-32-bit state (i16 labels/stamps, i8 masks) would
roughly double VPU throughput but does not compile through the current
remote Mosaic toolchain (probed 2026-08; revisit).
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
# BF/CC kernels: fully-unrolled static-index form up to this many 64-row
# blocks (<= 1024^2 frames); the dynamic-block loop form beyond. The unrolled
# form schedules better in the all-blocks-active BULK phase, the loop form
# keeps Mosaic program size (and compile time) O(1) in H for 2048^2-class and
# row-stacked shapes.
_UNROLL_MAX_BLOCKS = 16
# Ungated static bulk prologue: this many Jacobi sweeps run with every block
# active and static addressing before the gated (loop) kernel converges the
# tail — in the bulk phase everything IS active, so gating machinery is pure
# overhead (the settle's p50 arrival stamp at 1024^2 is 24). 0 disables.
_BULK_SWEEPS = 24
# History: before the tail's last-sweep-only flags, the gated tail's
# per-visit any() reductions made ungated bulk sweeps cheaper deep into the
# mid-phase at 2048^2 (settle 23.0/21.2/20.0 ms at bulk 24/48/96); with them
# the tail is the cheaper executor again at every size (18.9/19.1/19.1), so
# one small prologue fits all.
# Bulk kernels unroll blocks statically; aim for ~16 blocks at any H (bigger
# blocks = fewer halo copies, and gating granularity is irrelevant here).
_BULK_BLOCK_TARGET = 16
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
    """Shift a (rows, cols) block by one column; vacated column filled with
    ``fill`` — a scalar, or a (rows, 1) halo column (2D-tiled settle)."""
    if getattr(fill, "ndim", 0) != 2:
        fill = jnp.full((x.shape[0], 1), fill, x.dtype)
    if right:  # out[:, c] = x[:, c-1]
        return jnp.concatenate([fill.astype(x.dtype), x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], fill.astype(x.dtype)], axis=1)


def _diffusion_loop_kernel(aux_ref, st_in_ref, st_ref, halo_ref, flags_ref,
                           run_ref, cnt_ref, *, combine, fill, block,
                           sweep_batch):
    """Generic batch-gated min-diffusion to fixpoint, dynamic-block-index form.

    Shared by the Bellman-Ford flood (state f32, aux = image) and the
    connected-component min-index diffusion (state i32, aux = mask):
    per sweep, ``st <- combine(st, 4-neighbor min of st, aux)`` with
    ``fill`` at the image border. Blocks are visited via ``lax.fori_loop``
    over a compact ACTIVE LIST rebuilt each batch — program size is O(1) in
    H (the unrolled kernels' Mosaic compile time exploded past ~32 gated
    blocks), and quiet blocks cost nothing per sweep.

    Gating is exact: updates are monotone non-increasing, and a block whose
    batch ended with a no-change sweep is at a local fixpoint for halos that
    cannot change while its neighbors are also quiet; any later halo change
    first flags a neighbor, which re-activates this block one batch later.
    Index scheme: halo rows (2n+2, W) with ``fill`` sentinels at [0]/[2n+1],
    block b's rows at [2b+1]/[2b+2]; flags (n+2,) with zero sentinels.
    """
    H, W = aux_ref.shape
    n_blocks = H // block
    # fill must be a PYTHON number (a jnp scalar would be a captured constant,
    # which pallas_call rejects for kernel closures)
    fill_row = jnp.full((W,), fill, st_ref.dtype)

    def init_b(b, _):
        r0 = b * block
        # explicit copy-in: a no-op when the input/output alias is honored,
        # and the only correct initialization when it is not — on real TPUs
        # the aliased output buffer has been observed arriving UNFILLED
        st_ref[pl.ds(r0, block), :] = st_in_ref[pl.ds(r0, block), :]
        flags_ref[b + 1] = jnp.int32(1)
        return 0

    jax.lax.fori_loop(0, n_blocks, init_b, 0)
    halo_ref[0, :] = fill_row
    halo_ref[2 * n_blocks + 1, :] = fill_row
    flags_ref[0] = jnp.int32(0)
    flags_ref[n_blocks + 1] = jnp.int32(0)

    def batch_body(carry):
        _, it = carry

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
        for st_i in range(sweep_batch):
            last = st_i == sweep_batch - 1

            def halo_i(i, _):
                b = run_ref[i]
                r0 = b * block
                halo_ref[2 * b + 1, :] = st_ref[r0, :]
                halo_ref[2 * b + 2, :] = st_ref[r0 + block - 1, :]
                return 0

            jax.lax.fori_loop(0, cnt, halo_i, 0)

            def run_i(i, _, last=last):
                b = run_ref[i]
                r0 = b * block
                st = st_ref[pl.ds(r0, block), :]
                aux = aux_ref[pl.ds(r0, block), :]
                cand = jnp.minimum(
                    jnp.minimum(
                        _shift_rows(st, True, halo_ref[2 * b, :]),
                        _shift_rows(st, False, halo_ref[2 * b + 3, :])),
                    jnp.minimum(_shift_cols(st, True, fill),
                                _shift_cols(st, False, fill)))
                new = combine(st, cand, aux)
                if last:
                    flags_ref[b + 1] = jnp.any(new < st).astype(jnp.int32)
                st_ref[pl.ds(r0, block), :] = new
                return 0

            jax.lax.fori_loop(0, cnt, run_i, 0)

        def or_b(b, a):
            return a | flags_ref[b + 1]

        changed = jax.lax.fori_loop(0, n_blocks, or_b, jnp.int32(0))
        cnt_ref[0] = cnt
        return changed > 0, it + sweep_batch

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), batch_body,
                       (jnp.bool_(True), jnp.int32(0)))


def _diffusion_unrolled_kernel(aux_ref, st_in_ref, st_ref, halo_ref,
                               flags_ref, nflags_ref, *, combine, fill,
                               block, sweep_batch):
    """Static-index (fully unrolled) twin of ``_diffusion_loop_kernel``.

    Same math and the same batch-granular activity gating, but every block
    visit is a statically-indexed code block instead of a ``fori_loop`` over
    an active list, so Mosaic can schedule the per-block vector work without
    dynamic-address overhead. Used when ``n_blocks <= _UNROLL_MAX_BLOCKS``
    (512^2/1024^2 frames) — the loop form's per-block dispatch costs real
    time in the BULK phase where every block is active, while the unrolled
    form's compile time only explodes past ~32 blocks."""
    H, W = aux_ref.shape
    n_blocks = H // block
    fill_row = jnp.full((W,), fill, st_ref.dtype)
    # explicit copy-in (see _diffusion_loop_kernel: aliased outputs can
    # arrive unfilled)
    for b in range(n_blocks):
        r0 = b * block
        st_ref[pl.ds(r0, block), :] = st_in_ref[pl.ds(r0, block), :]
        flags_ref[b] = jnp.int32(1)

    def batch_body(carry):
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
        for s in range(sweep_batch):
            last = s == sweep_batch - 1
            # snapshot block-boundary halo rows (pre-sweep: Jacobi semantics)
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _halo(b=b):
                    halo_ref[2 * b, :] = st_ref[b * block, :]
                    halo_ref[2 * b + 1, :] = st_ref[(b + 1) * block - 1, :]
            for b in range(n_blocks):
                @pl.when(nflags_ref[b] > 0)
                def _run(b=b, last=last):
                    r0 = b * block
                    st = st_ref[pl.ds(r0, block), :]
                    aux = aux_ref[pl.ds(r0, block), :]
                    up_edge = halo_ref[2 * b - 1, :] if b > 0 else fill_row
                    dn_edge = halo_ref[2 * b + 2, :] if b < n_blocks - 1 \
                        else fill_row
                    cand = jnp.minimum(
                        jnp.minimum(_shift_rows(st, True, up_edge),
                                    _shift_rows(st, False, dn_edge)),
                        jnp.minimum(_shift_cols(st, True, fill),
                                    _shift_cols(st, False, fill)))
                    new = combine(st, cand, aux)
                    if last:
                        flags_ref[b] = jnp.any(new < st).astype(jnp.int32)
                    st_ref[pl.ds(r0, block), :] = new
        changed = flags_ref[0] > 0
        for b in range(1, n_blocks):
            changed = changed | (flags_ref[b] > 0)
        return changed, it + sweep_batch

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), batch_body,
                       (jnp.bool_(True), jnp.int32(0)))


def _diffusion_bulk_kernel(aux_ref, st_in_ref, st_ref, halo_ref, *, combine,
                           fill, block, n_sweeps):
    """Ungated static prologue of the diffusion: exactly ``n_sweeps`` Jacobi
    sweeps with EVERY block updated, all addresses static (see
    ``_settle_bulk_kernel`` for the rationale; these are monotone fixpoint
    iterations, so any prefix of sweeps is identical no matter which kernel
    runs it). Halo rows at (2b, 2b+1) per block, no sentinels needed —
    edge blocks use ``fill`` rows directly (static specialization)."""
    H, W = aux_ref.shape
    n_blocks = H // block
    fill_row = jnp.full((W,), fill, st_ref.dtype)
    for b in range(n_blocks):
        r0 = b * block
        st_ref[pl.ds(r0, block), :] = st_in_ref[pl.ds(r0, block), :]

    def sweep(_, __):
        for b in range(n_blocks):
            halo_ref[2 * b, :] = st_ref[b * block, :]
            halo_ref[2 * b + 1, :] = st_ref[(b + 1) * block - 1, :]
        for b in range(n_blocks):
            r0 = b * block
            st = st_ref[pl.ds(r0, block), :]
            aux = aux_ref[pl.ds(r0, block), :]
            up_edge = halo_ref[2 * b - 1, :] if b > 0 else fill_row
            dn_edge = halo_ref[2 * b + 2, :] if b < n_blocks - 1 else fill_row
            cand = jnp.minimum(
                jnp.minimum(_shift_rows(st, True, up_edge),
                            _shift_rows(st, False, dn_edge)),
                jnp.minimum(_shift_cols(st, True, fill),
                            _shift_cols(st, False, fill)))
            st_ref[pl.ds(r0, block), :] = combine(st, cand, aux)
        return 0

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)


def _diffusion_call(kernel, aux, st0, dtype):
    H, W = aux.shape
    n_blocks = H // _BLOCK
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_blocks + 2, W), dtype),
                        pltpu.SMEM((n_blocks + 2,), jnp.int32),
                        pltpu.SMEM((n_blocks,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(aux, st0)


def _diffusion_call_unrolled(kernel, aux, st0, dtype):
    H, W = aux.shape
    n_blocks = H // _BLOCK
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_blocks, W), dtype),
                        pltpu.SMEM((n_blocks,), jnp.int32),
                        pltpu.SMEM((n_blocks,), jnp.int32)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(aux, st0)


def _bulk_block_for(H: int) -> int:
    """The 64-multiple divisor of H whose block count is nearest the target
    (H % 64 == 0 is guaranteed by pallas_flood_supported, so 64 always
    qualifies and the candidate list is never empty)."""
    return min((m for m in range(64, H + 1, 64) if H % m == 0),
               key=lambda m: abs(H // m - _BULK_BLOCK_TARGET))


def _diffusion_bulk_call(combine, fill, aux, st0, dtype, n_sweeps):
    H, W = aux.shape
    block = _bulk_block_for(H)
    n_blocks = H // block
    kernel = functools.partial(_diffusion_bulk_kernel, combine=combine,
                               fill=fill, block=block, n_sweeps=n_sweeps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_blocks, W), dtype)],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(aux, st0)


def _dispatch_diffusion(combine, fill, aux, st0, dtype, force_loop: bool,
                        bulk_sweeps: int | None = None):
    n_blocks = aux.shape[0] // _BLOCK
    if force_loop or n_blocks > _UNROLL_MAX_BLOCKS:
        if bulk_sweeps is None:
            bulk_sweeps = _BULK_SWEEPS
        if bulk_sweeps > 0:
            # static ungated prologue for the all-active bulk phase; the gated
            # loop kernel converges the tail (identical fixpoint & values: the
            # updates are monotone and extra visits are no-ops)
            st0 = _diffusion_bulk_call(combine, fill, aux, st0, dtype,
                                       bulk_sweeps)
        kernel = functools.partial(_diffusion_loop_kernel, combine=combine,
                                   fill=fill, block=_BLOCK,
                                   sweep_batch=_SWEEP_BATCH)
        return _diffusion_call(kernel, aux, st0, dtype)
    kernel = functools.partial(_diffusion_unrolled_kernel, combine=combine,
                               fill=fill, block=_BLOCK,
                               sweep_batch=_SWEEP_BATCH)
    return _diffusion_call_unrolled(kernel, aux, st0, dtype)


@functools.partial(jax.jit, static_argnames=("force_loop", "bulk_sweeps"))
def bf_flood_pallas(img: jnp.ndarray, seeds: jnp.ndarray,
                    force_loop: bool = False,
                    bulk_sweeps: int | None = None) -> jnp.ndarray:
    """Flood levels lam = minimax path elevation from any seed (phase 1)."""
    img = img.astype(jnp.float32)
    lam0 = jnp.where(seeds > 0, img, jnp.inf).astype(jnp.float32)

    def combine(st, cand, aux):
        return jnp.minimum(st, jnp.maximum(cand, aux))

    return _dispatch_diffusion(combine, float("inf"), img, lam0, jnp.float32,
                               force_loop, bulk_sweeps)


@functools.partial(jax.jit, static_argnames=("force_loop", "bulk_sweeps",
                                             "scan"))
def cc_diffusion_pallas(mask: jnp.ndarray, init: jnp.ndarray | None = None,
                        force_loop: bool = False,
                        bulk_sweeps: int | None = None,
                        scan: bool | None = None) -> jnp.ndarray:
    """4-connected component labels by min-diffusion: each component gets the MIN of
    its pixels' initial values (-1 outside the mask). With the default init (the flat
    pixel index) that is the root/top-left index. A custom ``init`` lets callers fold
    component-wide predicates into the same kernel — e.g. regional_minima_labels
    seeds escaping-plateau pixels with (idx - n) so any poisoned component surfaces
    as a negative value, replacing a separate scatter-table membership test.
    (Pointer jumping would need big gathers, which run at ~300 MB/s on this TPU —
    plateau diameters here are cell-sized, so diffusion sweeps win.)

    ``scan`` (default off): use the segmented-scan kernel (``_cc_scan_call``)
    — O(log) doubling passes per global row/column scan instead of one sweep
    per plateau-diameter step. The component-min fixpoint is
    schedule-independent, so both forms return the identical array (asserted
    in tests). The scan's per-iteration cost is FIXED (~22 doubling passes),
    so it wins by an order of magnitude on image-diameter plateaus (binary
    boundary maps: the background sea needs ~H sweeps) and loses ~2x on
    smooth images whose plateaus are tiny (a few gated sweeps) — callers
    pick by what they feed it (unet_postprocess: scan; the threshold+blur
    watershed path: sweeps)."""
    H, W = mask.shape
    n = H * W
    idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    base = idx if init is None else init.astype(jnp.int32)
    lbl0 = jnp.where(mask, base, jnp.int32(n))
    if scan is None:
        scan = False
    if scan:
        m = mask.astype(jnp.int32)
        conn_h = jnp.pad(m[:, 1:] & m[:, :-1], ((0, 0), (1, 0)))
        conn_v = jnp.pad(m[1:] & m[:-1], ((1, 0), (0, 0)))
        lbl = _cc_scan_call(conn_h | (conn_v << 1), lbl0)
        return jnp.where(mask, lbl, -1)

    def combine(st, cand, aux):
        return jnp.where(aux > 0, jnp.minimum(st, cand),
                         jnp.int32(n))  # n is static (shape-derived)

    lbl = _dispatch_diffusion(combine, n, mask.astype(jnp.int32), lbl0,
                              jnp.int32, force_loop, bulk_sweeps)
    return jnp.where(mask, lbl, -1)


_SCAN_BLOCK = 32
_SCAN_BIG = 1 << 30  # python int: a jnp scalar would be a captured constant
_SCAN_MAX_ITERS = 256


def _cc_scan_kernel(conn_ref, lbl_in_ref, lbl_ref, old_ref, ga_ref, gb_ref,
                    *, block=_SCAN_BLOCK):
    """Connected-component min by iterated segmented H/V min-scans.

    The sweep kernels pay one full Jacobi pass per plateau-diameter step
    (40-170 sweeps on cell-interior / background-sea plateaus). Here one
    iteration is a full horizontal then vertical segmented min-scan, each by
    log2 doubling: after the step with offset k, ``v[i] = min(v[j] for j in
    [i-2k+1, i] if the run j..i is gap-free)``, with the gap-free predicate
    ``g`` doubled alongside (g'[i] = g[i] & g[i-k]). Convex-ish components
    converge in ONE iteration; spirals need one per staircase turn; the
    fixpoint is reached when an iteration changes nothing.

    Exactness: v[i] <- min(v[i], v[j]) is only applied for truly connected
    (i, j) — g never overstates connectivity (doubled from a ping-pong
    snapshot) — so every value v carries belongs to a pixel connected to its
    holder: v is bounded below by the component min, monotone, and constant
    per component at any fixpoint => the limit is the component min for ANY
    visit order. That schedule-independence lets the vertical scan read
    already-updated rows in place (Gauss-Seidel acceleration, no second v
    buffer) — unlike the settle, which needs Jacobi discipline for stamps.

    conn packing: bit0 = connected to the left neighbor, bit1 = connected to
    the row above (border pixels carry 0s by construction).
    """
    H, W = conn_ref.shape
    n_blocks = H // block
    big = _SCAN_BIG

    def hsteps(v, g, right: bool):
        for p in range(max(W - 1, 1).bit_length()):
            k = 1 << p
            rows = v.shape[0]
            if right:
                vs = jnp.concatenate(
                    [jnp.full((rows, k), big, jnp.int32), v[:, :W - k]], 1)
                gs = jnp.concatenate(
                    [jnp.zeros((rows, k), jnp.int32), g[:, :W - k]], 1)
            else:
                vs = jnp.concatenate(
                    [v[:, k:], jnp.full((rows, k), big, jnp.int32)], 1)
                gs = jnp.concatenate(
                    [g[:, k:], jnp.zeros((rows, k), jnp.int32)], 1)
            v = jnp.where(g > 0, jnp.minimum(v, vs), v)
            g = g & gs
        return v

    def init_b(b, _):
        lbl_ref[pl.ds(b * block, block), :] = \
            lbl_in_ref[pl.ds(b * block, block), :]
        return 0

    jax.lax.fori_loop(0, n_blocks, init_b, 0)

    def vphase(down: bool):
        # Mosaic requires provably-aligned sublane offsets for (block, W)
        # loads, so every dynamic read below is at (b +- j) * block; sub-block
        # shifts (k < block) are assembled from two aligned reads with STATIC
        # value slicing.
        # level-0 gap predicate into ga: row r connected to its scan-source
        # side (down: the row above; up: the row below)
        def g0_b(i, _):
            b = i if down else n_blocks - 1 - i
            up_edge = (conn_ref[pl.ds(b * block, block), :] >> 1) & 1
            if down:
                ga_ref[pl.ds(b * block, block), :] = up_edge
            else:
                nb = jnp.minimum(b + 1, n_blocks - 1)
                nxt_first = (conn_ref[pl.ds(nb * block, block), :][:1] >> 1) & 1
                nxt = jnp.where(b + 1 < n_blocks, nxt_first,
                                jnp.zeros((1, W), jnp.int32))
                ga_ref[pl.ds(b * block, block), :] = jnp.concatenate(
                    [up_edge[1:], nxt], 0)
            return 0

        jax.lax.fori_loop(0, n_blocks, g0_b, 0)
        for p in range(max(H - 1, 1).bit_length()):
            k = 1 << p
            gr, gw = (ga_ref, gb_ref) if p % 2 == 0 else (gb_ref, ga_ref)

            def sub_b(i, _, k=k):
                # k < block: source window shifted k rows into the adjacent
                # block — concat(adjacent slice, own slice), both aligned.
                # GS order (down: top->bottom, up: bottom->up) lets in-place
                # source reads see already-updated rows — sound because the
                # fixpoint is schedule-independent (see docstring).
                b = i if down else n_blocks - 1 - i
                r0 = b * block
                v = lbl_ref[pl.ds(r0, block), :]
                g = gr[pl.ds(r0, block), :]
                if down:
                    pv = lbl_ref[pl.ds((b - 1) * block, block), :]
                    pg = gr[pl.ds((b - 1) * block, block), :]
                    vs = jnp.concatenate([pv[block - k:], v[:block - k]], 0)
                    gs = jnp.concatenate([pg[block - k:], g[:block - k]], 0)
                else:
                    nv = lbl_ref[pl.ds((b + 1) * block, block), :]
                    ng = gr[pl.ds((b + 1) * block, block), :]
                    vs = jnp.concatenate([v[k:], nv[:k]], 0)
                    gs = jnp.concatenate([g[k:], ng[:k]], 0)
                lbl_ref[pl.ds(r0, block), :] = \
                    jnp.where(g > 0, jnp.minimum(v, vs), v)
                gw[pl.ds(r0, block), :] = g & gs
                return 0

            def full_b(i, _, k=k):
                # k >= block: the source window is a whole aligned block
                b = i if down else n_blocks - 1 - i
                r0 = b * block
                sb = (b - k // block) if down else (b + k // block)
                v = lbl_ref[pl.ds(r0, block), :]
                g = gr[pl.ds(r0, block), :]
                vs = lbl_ref[pl.ds(sb * block, block), :]
                gs = gr[pl.ds(sb * block, block), :]
                lbl_ref[pl.ds(r0, block), :] = \
                    jnp.where(g > 0, jnp.minimum(v, vs), v)
                gw[pl.ds(r0, block), :] = g & gs
                return 0

            if k < block:
                # the edge block's window sticks out of the image: build its
                # shifted source with fill, statically (it is also FIRST in
                # GS order, preserving the acceleration)
                r0 = 0 if down else H - block
                v = lbl_ref[pl.ds(r0, block), :]
                g = gr[pl.ds(r0, block), :]
                fillv = jnp.full((k, W), big, jnp.int32)
                fillg = jnp.zeros((k, W), jnp.int32)
                if down:
                    vs = jnp.concatenate([fillv, v[:block - k]], 0)
                    gs = jnp.concatenate([fillg, g[:block - k]], 0)
                else:
                    vs = jnp.concatenate([v[k:], fillv], 0)
                    gs = jnp.concatenate([g[k:], fillg], 0)
                lbl_ref[pl.ds(r0, block), :] = \
                    jnp.where(g > 0, jnp.minimum(v, vs), v)
                gw[pl.ds(r0, block), :] = g & gs
                jax.lax.fori_loop(1, n_blocks, sub_b, 0)
            else:
                n_skip = k // block  # blocks whose whole window is outside

                def guarded_b(i, _):
                    b = i if down else n_blocks - 1 - i

                    def dead(_):
                        # window crosses the image edge: no source, and the
                        # doubled predicate is identically 0
                        gw[pl.ds(b * block, block), :] = \
                            jnp.zeros((block, W), jnp.int32)
                        return 0

                    return jax.lax.cond(i < n_skip, dead,
                                        lambda _: full_b(i, 0), 0)

                if n_skip < n_blocks:
                    jax.lax.fori_loop(0, n_blocks, guarded_b, 0)

    def iter_body(carry):
        _, it = carry

        def snap_b(b, _):
            old_ref[pl.ds(b * block, block), :] = \
                lbl_ref[pl.ds(b * block, block), :]
            return 0

        jax.lax.fori_loop(0, n_blocks, snap_b, 0)

        # --- horizontal phase (rows are block-local): forward then backward
        def h_b(b, _):
            r0 = b * block
            v = lbl_ref[pl.ds(r0, block), :]
            g_fwd = conn_ref[pl.ds(r0, block), :] & 1
            v = hsteps(v, g_fwd, right=True)
            g_bwd = jnp.concatenate(
                [g_fwd[:, 1:], jnp.zeros((block, 1), jnp.int32)], 1)
            v = hsteps(v, g_bwd, right=False)
            lbl_ref[pl.ds(r0, block), :] = v
            return 0

        jax.lax.fori_loop(0, n_blocks, h_b, 0)

        # --- vertical phase: down then up
        vphase(True)
        vphase(False)

        def chg_b(b, a):
            d = lbl_ref[pl.ds(b * block, block), :] != \
                old_ref[pl.ds(b * block, block), :]
            return a | jnp.any(d).astype(jnp.int32)

        changed = jax.lax.fori_loop(0, n_blocks, chg_b, jnp.int32(0))
        return changed > 0, it + 1

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _SCAN_MAX_ITERS), iter_body,
                       (jnp.bool_(True), jnp.int32(0)))


def _cc_scan_call(conn: jnp.ndarray, lbl0: jnp.ndarray) -> jnp.ndarray:
    H, W = conn.shape
    return pl.pallas_call(
        _cc_scan_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.int32),
            pltpu.VMEM((H, W), jnp.int32),
            pltpu.VMEM((H, W), jnp.int32),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(conn.astype(jnp.int32), lbl0.astype(jnp.int32))


def _settle_mask(lam: jnp.ndarray) -> jnp.ndarray:
    """Precompute the settle's lam comparisons as an int32 bitmask.

    ``lam`` is READ-ONLY throughout the settle, and the sweeps consume it only
    through 8 per-pixel predicates: for each 4-neighbor k, (qv_k < lam) and
    (qv_k <= lam) with +inf outside the border. Baking those into bits 0-3
    (strict) and 4-7 (non-strict) ONCE in XLA lets every settle kernel drop
    lam entirely — no lam state ref, no lam halo arrays, and per block-visit
    the 4 shifted-lam constructions + 8 float compares become 8 int bit
    tests. Neighbor order matches ``_settle_math``: N, S, W, E."""
    H, W = lam.shape
    inf = jnp.float32(jnp.inf)
    qs = [
        jnp.concatenate([jnp.full((1, W), inf), lam[:-1]], axis=0),
        jnp.concatenate([lam[1:], jnp.full((1, W), inf)], axis=0),
        jnp.concatenate([jnp.full((H, 1), inf), lam[:, :-1]], axis=1),
        jnp.concatenate([lam[:, 1:], jnp.full((H, 1), inf)], axis=1),
    ]
    m = jnp.zeros((H, W), jnp.int32)
    for k, q in enumerate(qs):
        m = m | ((q < lam).astype(jnp.int32) << k)
        m = m | ((q <= lam).astype(jnp.int32) << (4 + k))
    return m


def _settle_math(mask, lbl, up, dn, left=None, right=None):
    """One Jacobi settle sweep over a (rows, cols) block — the pure math
    shared by the bulk (static) and tail (gated loop) settle kernels.
    ``mask`` is the precomputed lam-comparison bitmask (``_settle_mask``);
    ``up``/``dn`` are lbl halo rows; ``left``/``right`` are lbl halo columns
    as (rows, 1) arrays (None = image border: 0). Returns (new_lbl, can).

    The donated label needs NO priority tie-break: it is only taken in the
    no-conflict branch, where by definition every donor carries the same
    label, so ``maxl`` (already tracked for conflict detection) IS the label.
    Likewise the arrival stamps ``t`` are write-only here (``_apply_lines``
    reads them afterwards, neighbors never do), so the sweep carries no
    (best_v, best_t, best_l) chain and no t shifts/halos — ~30% of the
    original per-pixel op count, bit-identical output."""
    block, W = lbl.shape
    lbl_l = 0 if left is None else left
    lbl_r = 0 if right is None else right
    settled = lbl != 0
    qls = [
        _shift_rows(lbl, True, up),
        _shift_rows(lbl, False, dn),
        _shift_cols(lbl, True, lbl_l),
        _shift_cols(lbl, False, lbl_r),
    ]
    ready = jnp.ones_like(settled)
    all_eq = jnp.ones_like(settled)
    minl = jnp.full((block, W), jnp.int32((1 << 30)), jnp.int32)
    maxl = jnp.zeros((block, W), jnp.int32)
    for k, ql in enumerate(qls):
        qsettled = ql != 0
        lt = (mask & (1 << k)) != 0        # qv_k < lam
        le = (mask & (1 << (4 + k))) != 0  # qv_k <= lam
        ready = ready & ((~lt) | qsettled)
        all_eq = all_eq & ((~le) | qsettled)
        donor = (ql > 0) & le
        minl = jnp.where(donor, jnp.minimum(minl, ql), minl)
        maxl = jnp.where(donor, jnp.maximum(maxl, ql), maxl)
    has_donor = maxl > 0
    conflict = has_donor & (minl != maxl)
    unsettled = ~settled
    settle_lbl = unsettled & ready & has_donor & (~conflict)
    settle_line = unsettled & ready & conflict
    settle_void = unsettled & ready & (~has_donor) & all_eq
    can = settle_lbl | settle_line | settle_void
    new_lbl = jnp.where(
        settle_lbl, maxl,
        jnp.where(settle_line, -1, jnp.where(settle_void, -2, lbl)))
    return new_lbl, can


# --- packed settle state: ONE int32 word per pixel, (t << 21) | (lbl + 2) ---
#
# The sweeps read/write lbl and t together (t is stamped exactly when lbl
# settles), so carrying them as separate i32 planes pays 2 VMEM loads + 2
# stores per block-visit where one word pays 1 + 1: per-pixel sweep traffic
# drops from 20 B (mask 4 + lbl r/w 8 + t r/w 8) to 12 B. Encoding: the low
# 21 bits hold enc = lbl + 2 (kernel lbl domain {-2,-1,0,1..N} -> {0,1,2,3..}),
# the high 10 bits hold the arrival stamp, with t = _PACK_T_BIG the
# "never settled" sentinel (bit 31 stays 0, so i32 compares/shifts are safe).
# enc order == label order (constant bias), so the donor min/max/conflict
# logic runs directly on enc values. Applicability: labels must fit 21 bits.
# Dense raster ranks from regional_minima_labels usually do, but the worst
# case is H*W/2 (a checkerboard: every other pixel a separate 4-CC minimum)
# = 2.10M at 2048^2 and 2.23M at the 4352x1024 stacked cap — both past
# 2^21-3, so the bound is enforced at RUNTIME: settle_pallas_loop checks
# seeds.max() and routes oversized label sets to the unpacked kernels via
# lax.cond. watershed() passes dense_labels=False for user-supplied markers.
# Stamps must fit 10 bits: the packed tail stops at sweep 1022 and reports
# convergence; the (pathological: needs a ~H+W-long monotone chain, never hit
# by real tissue frames) unconverged case falls back to the unpacked settle
# via lax.cond, so the output is bit-identical to the unpacked kernels for
# EVERY input.
_PACK_SHIFT = 21
_PACK_ENC_MASK = (1 << _PACK_SHIFT) - 1
_PACK_T_BIG = (1 << (31 - _PACK_SHIFT)) - 1  # 1023 = never-settled sentinel


def _settle_math_packed(mask, w, it, up, dn):
    """Packed-word twin of ``_settle_math`` (full-width blocks only): same
    predicates on enc = w & mask21, update stamps the sweep index into the
    high bits of the settled word. Returns (new_w, can).

    Op-lean form (bit-identical to the straightforward one, ~25% fewer VPU
    ops — the settle is VPU-compute-bound, ~0.2 ms per all-active sweep at
    2048^2):
    - readiness: instead of 4x ((~lt|qs), (~le|qs)) boolean chains, OR the
      pixel's own mask bits for each UNSETTLED neighbor direction into
      ``blocked`` — ready = no strict bit blocked (low nibble), all_eq = no
      non-strict bit blocked (high nibble).
    - donors: the le bit is broadcast to an all-ones/zeros lane mask
      (``lem``, two shifts) so the donor value is ``qenc & lem`` with no
      select; the max runs unfiltered (non-donor encs are <= 2 and lose to
      any real label, and has_donor = maxl > 2 tests genuineness), and the
      min runs on (dv - 3) as if unsigned, so line/void/unsettled/no-le
      values wrap to huge instead of needing a (donor ? enc : BIG) select.
      Mosaic can't legalize ``arith.minui``, so the unsigned min is done as
      a SIGNED min with the sign bit folded into the bias: min_u(x) =
      min_s(x ^ 0x80000000) ^ 0x80000000, and (dv - 3) ^ 0x80000000 is just
      the wrapping add dv + (2^31 - 3)."""
    block, W = w.shape
    enc = w & _PACK_ENC_MASK
    unsettled = enc == 2
    qws = [
        _shift_rows(w, True, up),
        _shift_rows(w, False, dn),
        _shift_cols(w, True, 2),
        _shift_cols(w, False, 2),
    ]
    bias = jnp.int32(2**31 - 3)  # wrapping (x - 3) ^ signbit in one add
    blocked = jnp.zeros((block, W), jnp.int32)
    maxl = jnp.zeros((block, W), jnp.int32)
    mins = jnp.full((block, W), jnp.int32(2**31 - 1), jnp.int32)
    for k, qw in enumerate(qws):
        qenc = qw & _PACK_ENC_MASK
        kbits = (1 << k) | (1 << (4 + k))
        blocked = blocked | jnp.where(qenc == 2, mask & kbits, 0)
        # all-ones where this direction's le bit is set (arith shift of the
        # bit into/from the sign position)
        lem = (mask << (27 - k)) >> 31
        dv = qenc & lem
        maxl = jnp.maximum(maxl, dv)
        mins = jnp.minimum(mins, dv + bias)
    ready = (blocked & 0xF) == 0
    all_eq = blocked < 16  # no le bit blocked (blocked is non-negative)
    has_donor = maxl > 2
    minl = mins - bias  # garbage when no donor; gated below
    conflict = has_donor & (minl != maxl)
    ur = unsettled & ready
    settle_lbl = ur & has_donor & (~conflict)
    settle_line = ur & conflict
    settle_void = ur & (~has_donor) & all_eq
    can = settle_lbl | settle_line | settle_void
    new_enc = jnp.where(settle_lbl, maxl,
                        jnp.where(settle_line, 1, 0))
    new_w = jnp.where(can, (it << _PACK_SHIFT) | new_enc, w)
    return new_w, can


def _settle_bulk_kernel_packed(mask_ref, w_in_ref, w_ref, w_halo, *, block,
                               n_sweeps):
    """Packed-word twin of ``_settle_bulk_kernel`` (one state plane)."""
    H, W = mask_ref.shape
    n_blocks = H // block
    for b in range(n_blocks):
        r0 = b * block
        w_ref[pl.ds(r0, block), :] = w_in_ref[pl.ds(r0, block), :]
    w_halo[0, :] = jnp.full((W,), 2, jnp.int32)
    w_halo[2 * n_blocks + 1, :] = jnp.full((W,), 2, jnp.int32)

    def sweep(it, _):
        for b in range(n_blocks):
            r0 = b * block
            w_halo[2 * b + 1, :] = w_ref[r0, :]
            w_halo[2 * b + 2, :] = w_ref[r0 + block - 1, :]
        for b in range(n_blocks):
            r0 = b * block
            mask = mask_ref[pl.ds(r0, block), :]
            w = w_ref[pl.ds(r0, block), :]
            new_w, _ = _settle_math_packed(mask, w, it, w_halo[2 * b, :],
                                           w_halo[2 * b + 3, :])
            w_ref[pl.ds(r0, block), :] = new_w
        return 0

    jax.lax.fori_loop(1, n_sweeps + 1, sweep, 0)


def _settle_bulk_kernel(mask_ref, lbl_in_ref, t_in_ref, lbl_ref, t_ref,
                        lbl_halo, *, block, n_sweeps):
    """Ungated static prologue of the settle: exactly ``n_sweeps`` Jacobi
    sweeps with EVERY block updated, all block addresses static.

    In the bulk phase (first ~p50 sweeps) every block is genuinely active, so
    the gated loop kernel's per-block dispatch (active-list scan, scalar SMEM
    reads, dynamic addressing on 6 refs per block per sweep) is pure overhead
    there. This kernel is straight-line per sweep — n_blocks statically
    unrolled block updates inside a ``fori_loop`` over sweeps — which Mosaic
    schedules like the old unrolled settle but without the gating branches
    that blew up its program size. The gated loop kernel then finishes the
    tail from sweep ``n_sweeps + 1``; any prefix of Jacobi sweeps is the same
    regardless of who runs it, so the split output is bit-identical."""
    H, W = mask_ref.shape
    n_blocks = H // block
    for b in range(n_blocks):
        r0 = b * block
        lbl_ref[pl.ds(r0, block), :] = lbl_in_ref[pl.ds(r0, block), :]
        t_ref[pl.ds(r0, block), :] = t_in_ref[pl.ds(r0, block), :]
    lbl_halo[0, :] = jnp.zeros((W,), jnp.int32)
    lbl_halo[2 * n_blocks + 1, :] = jnp.zeros((W,), jnp.int32)

    def sweep(it, _):
        for b in range(n_blocks):
            r0 = b * block
            lbl_halo[2 * b + 1, :] = lbl_ref[r0, :]
            lbl_halo[2 * b + 2, :] = lbl_ref[r0 + block - 1, :]
        for b in range(n_blocks):
            r0 = b * block
            mask = mask_ref[pl.ds(r0, block), :]
            lbl = lbl_ref[pl.ds(r0, block), :]
            new_lbl, can = _settle_math(mask, lbl, lbl_halo[2 * b, :],
                                        lbl_halo[2 * b + 3, :])
            lbl_ref[pl.ds(r0, block), :] = new_lbl
            t = t_ref[pl.ds(r0, block), :]
            t_ref[pl.ds(r0, block), :] = jnp.where(can, it, t)
        return 0

    jax.lax.fori_loop(1, n_sweeps + 1, sweep, 0)


def _settle_loop_kernel(mask_ref, lbl_in_ref, t_in_ref, lbl_ref, t_ref,
                        lbl_halo, flags_ref, run_ref,
                        cnt_ref, *, block=_SETTLE_BLOCK, sweep_batch=None,
                        it_start=1):
    """Dynamic-block-index variant of ``_settle_kernel``: the same math, but
    blocks are visited via ``lax.fori_loop`` over a compact ACTIVE LIST built
    once per batch, so the compiled program is O(1) in H — the unrolled
    kernel's Mosaic compile time grows with n_blocks and becomes the binding
    constraint at 2048^2-class and stacked-frame shapes (tens of minutes via
    the dev tunnel), while quiet blocks here cost nothing at all (not even a
    flag check per sweep).

    Index scheme (avoids b==0 / b==n-1 Python specializations):
    - the lbl halo row array is (2n+2, W) with zero sentinel rows [0] and
      [2n+1]; block b's rows live at [2b+1], [2b+2], so its up/dn halos are
      [2b] / [2b+3] unconditionally.
    - flags are (n+2,) with zero sentinels; block b's flag at [b+1].
    """
    if sweep_batch is None:
        sweep_batch = _SETTLE_SWEEP_BATCH
    H, W = mask_ref.shape
    n_blocks = H // block

    def init_b(b, _):
        r0 = b * block
        lbl_ref[pl.ds(r0, block), :] = lbl_in_ref[pl.ds(r0, block), :]
        t_ref[pl.ds(r0, block), :] = t_in_ref[pl.ds(r0, block), :]
        flags_ref[b + 1] = jnp.int32(1)
        return 0

    jax.lax.fori_loop(0, n_blocks, init_b, 0)
    lbl_halo[0, :] = jnp.zeros((W,), jnp.int32)
    lbl_halo[2 * n_blocks + 1, :] = jnp.zeros((W,), jnp.int32)
    flags_ref[0] = jnp.int32(0)
    flags_ref[n_blocks + 1] = jnp.int32(0)

    def _block_body(b, it, last):
        r0 = b * block
        mask = mask_ref[pl.ds(r0, block), :]
        lbl = lbl_ref[pl.ds(r0, block), :]
        new_lbl, can = _settle_math(mask, lbl, lbl_halo[2 * b, :],
                                    lbl_halo[2 * b + 3, :])
        lbl_ref[pl.ds(r0, block), :] = new_lbl
        t = t_ref[pl.ds(r0, block), :]
        t_ref[pl.ds(r0, block), :] = jnp.where(can, it, t)
        # flag only on the batch's LAST sweep (same argument as the diffusion
        # kernels): settling is monotone and halos are snapshotted per sweep,
        # so a block whose last sweep settled nothing is at a local fixpoint —
        # mid-batch changes already propagated to row-neighbors within the
        # batch, and a last-sweep change re-runs the neighbors via the
        # dilation in scan_b. Saves an any() reduction per visit on 7/8 of
        # sweeps.
        if last:
            flags_ref[b + 1] = jnp.any(can).astype(jnp.int32)

    def batch_body(carry):
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
        for s in range(sweep_batch):
            it = it0 + s

            def halo_i(i, _):
                b = run_ref[i]
                r0 = b * block
                lbl_halo[2 * b + 1, :] = lbl_ref[r0, :]
                lbl_halo[2 * b + 2, :] = lbl_ref[r0 + block - 1, :]
                return 0

            jax.lax.fori_loop(0, cnt, halo_i, 0)

            def run_i(i, _, last=s == sweep_batch - 1):
                _block_body(run_ref[i], it, last)
                return 0

            jax.lax.fori_loop(0, cnt, run_i, 0)

        def or_b(b, a):
            return a | flags_ref[b + 1]

        changed = jax.lax.fori_loop(0, n_blocks, or_b, jnp.int32(0))
        cnt_ref[0] = cnt  # debug/occupancy visibility
        return changed > 0, it0 + sweep_batch

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), batch_body,
                       (jnp.bool_(True), jnp.int32(it_start)))


def _settle_loop_kernel_packed(mask_ref, w_in_ref, w_ref, ok_ref, w_halo,
                               flags_ref, run_ref, cnt_ref, *,
                               block=_SETTLE_BLOCK, sweep_batch=None,
                               it_start=1):
    """Packed-word twin of ``_settle_loop_kernel``. Stamps must fit 10 bits,
    so the while loop stops once the NEXT batch could stamp past
    ``_PACK_T_BIG - 1`` and reports convergence in ``ok_ref`` (1 = the last
    batch settled nothing = fixpoint; 0 = stopped at the stamp cap, caller
    falls back to the unpacked settle)."""
    if sweep_batch is None:
        sweep_batch = _SETTLE_SWEEP_BATCH
    H, W = mask_ref.shape
    n_blocks = H // block

    def init_b(b, _):
        r0 = b * block
        w_ref[pl.ds(r0, block), :] = w_in_ref[pl.ds(r0, block), :]
        flags_ref[b + 1] = jnp.int32(1)
        return 0

    jax.lax.fori_loop(0, n_blocks, init_b, 0)
    w_halo[0, :] = jnp.full((W,), 2, jnp.int32)
    w_halo[2 * n_blocks + 1, :] = jnp.full((W,), 2, jnp.int32)
    flags_ref[0] = jnp.int32(0)
    flags_ref[n_blocks + 1] = jnp.int32(0)

    def _block_body(b, it, last):
        r0 = b * block
        mask = mask_ref[pl.ds(r0, block), :]
        w = w_ref[pl.ds(r0, block), :]
        new_w, can = _settle_math_packed(mask, w, it, w_halo[2 * b, :],
                                         w_halo[2 * b + 3, :])
        w_ref[pl.ds(r0, block), :] = new_w
        if last:  # last-sweep-only flags: see _settle_loop_kernel
            flags_ref[b + 1] = jnp.any(can).astype(jnp.int32)

    def batch_body(carry):
        _, it0 = carry

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
        for s in range(sweep_batch):
            it = it0 + s

            def halo_i(i, _):
                b = run_ref[i]
                r0 = b * block
                w_halo[2 * b + 1, :] = w_ref[r0, :]
                w_halo[2 * b + 2, :] = w_ref[r0 + block - 1, :]
                return 0

            jax.lax.fori_loop(0, cnt, halo_i, 0)

            def run_i(i, _, last=s == sweep_batch - 1):
                _block_body(run_ref[i], it, last)
                return 0

            jax.lax.fori_loop(0, cnt, run_i, 0)

        def or_b(b, a):
            return a | flags_ref[b + 1]

        changed = jax.lax.fori_loop(0, n_blocks, or_b, jnp.int32(0))
        cnt_ref[0] = cnt
        return changed > 0, it0 + sweep_batch

    final = jax.lax.while_loop(
        lambda c: c[0] & (c[1] + sweep_batch - 1 < _PACK_T_BIG), batch_body,
        (jnp.bool_(True), jnp.int32(it_start)))
    ok_ref[0, :] = jnp.full((128,), jnp.where(final[0], 0, 1), jnp.int32)


def _settle_loop2d_kernel(mask_ref, lbl_in_ref, t_in_ref, lbl_ref, t_ref,
                          lbl_rh, lbl_ch, flags_ref,
                          run_ref, cnt_ref, *, block, cblock, sweep_batch,
                          it_start):
    """2D-tiled twin of ``_settle_loop_kernel``: gating at (block x cblock)
    TILE granularity instead of full-width row blocks.

    Why: the settle tail follows thin watershed-line chains. A 16-row
    full-width block is "active" whenever a chain crosses it ANYWHERE in its
    W pixels, so at 2048^2 row gating skips almost nothing (measured: settle
    time flat in bulk_sweeps — every tail sweep still pays ~all blocks).
    Column-tiled gating only sweeps the tiles a chain actually passes
    through.

    Structure: column STRIPES are a static Python loop (n_cb = W/cblock is
    small, and static stripe offsets keep every lane index constant — Mosaic
    only needs dynamic addresses on sublanes, which the row kernels already
    rely on); rows within a stripe run via ``fori_loop`` over a per-stripe
    active list, so program size stays O(n_cb), not O(n_blocks).

    Halos: rows as in the 1D kernel (full-width arrays, active tiles
    snapshot their stripe's segment). Columns via an (H, 2*n_cb+2) array with
    halo columns at static lane indices, snapshotted per sweep by the owning
    tile. A quiet tile's snapshot is stale-but-equal: a tile only changes
    when it runs, and every run re-snapshots first.

    Gating exactness in 2D needs the run set to be the 3x3 (NOT just +row)
    dilation of last batch's changed tiles: within a batch, influence from a
    changed tile travels at most ``sweep_batch <= min(block, cblock)`` pixels
    of L1 distance, so it cannot fully cross a tile — but it CAN cut a corner
    (enter the top edge 1 px from the right edge and exit sideways within 2
    sweeps), i.e. reach a diagonal neighbor. The 3x3 dilation covers exactly
    the tiles reachable within one batch; everything else is the 1D argument
    unchanged. Jacobi discipline: per sweep, ALL stripes snapshot their halo
    rows/columns, then all stripes run — so every halo read is the pre-sweep
    value regardless of stripe order. Output (labels AND stamps) is
    bit-identical to the 1D kernels (asserted in tests)."""
    H, W = mask_ref.shape
    n_rb = H // block
    n_cb = W // cblock

    def init_b(rb, _):
        r0 = rb * block
        lbl_ref[pl.ds(r0, block), :] = lbl_in_ref[pl.ds(r0, block), :]
        t_ref[pl.ds(r0, block), :] = t_in_ref[pl.ds(r0, block), :]
        for cb in range(n_cb):
            flags_ref[rb + 1, cb + 1] = jnp.int32(1)
        return 0

    jax.lax.fori_loop(0, n_rb, init_b, 0)
    lbl_rh[0, :] = jnp.zeros((W,), jnp.int32)
    lbl_rh[2 * n_rb + 1, :] = jnp.zeros((W,), jnp.int32)
    lbl_ch[:, 0:1] = jnp.zeros((H, 1), jnp.int32)
    lbl_ch[:, 2 * n_cb + 1:2 * n_cb + 2] = jnp.zeros((H, 1), jnp.int32)

    def zero_border(i, _):
        for cb in range(n_cb + 2):
            flags_ref[0, cb] = jnp.int32(0)
            flags_ref[n_rb + 1, cb] = jnp.int32(0)
        flags_ref[i, 0] = jnp.int32(0)
        flags_ref[i, n_cb + 1] = jnp.int32(0)
        return 0

    jax.lax.fori_loop(0, n_rb + 2, zero_border, 0)

    def batch_body(carry):
        _, it0 = carry
        # per-stripe active lists = 3x3 dilation of last batch's change flags
        for cb in range(n_cb):
            def scan_b(rb, cnt, cb=cb):
                near = jnp.int32(0)
                for dr in range(3):
                    for dc in range(3):
                        near = near + flags_ref[rb + dr, cb + dc]

                def app(c):
                    run_ref[cb, c] = rb
                    return c + 1

                return jax.lax.cond(near > 0, app, lambda c: c, cnt)

            cnt_ref[cb] = jax.lax.fori_loop(0, n_rb, scan_b, jnp.int32(0))

        def clear_b(rb, _):
            for cb in range(n_cb):
                flags_ref[rb + 1, cb + 1] = jnp.int32(0)
            return 0

        jax.lax.fori_loop(0, n_rb, clear_b, 0)
        for s in range(sweep_batch):
            it = it0 + s
            # ALL stripes snapshot, then all run: a run in stripe cb reads
            # cb+1's column snapshot, which must be pre-THIS-sweep — the
            # interleaved order (snap cb, run cb, snap cb+1, ...) would hand
            # it cb+1's pre-PREVIOUS-sweep value (measured: 0.06% label
            # divergence).
            for cb in range(n_cb):
                c0 = cb * cblock

                def snap_i(i, _, cb=cb, c0=c0):
                    rb = run_ref[cb, i]
                    r0 = rb * block
                    lbl_rh[2 * rb + 1, c0:c0 + cblock] = \
                        lbl_ref[r0, c0:c0 + cblock]
                    lbl_rh[2 * rb + 2, c0:c0 + cblock] = \
                        lbl_ref[r0 + block - 1, c0:c0 + cblock]
                    tile = lbl_ref[pl.ds(r0, block), c0:c0 + cblock]
                    lbl_ch[pl.ds(r0, block), 2 * cb + 1:2 * cb + 2] = \
                        tile[:, :1]
                    lbl_ch[pl.ds(r0, block), 2 * cb + 2:2 * cb + 3] = \
                        tile[:, cblock - 1:]
                    return 0

                jax.lax.fori_loop(0, cnt_ref[cb], snap_i, 0)
            for cb in range(n_cb):
                c0 = cb * cblock

                def run_i(i, _, cb=cb, c0=c0, it=it,
                          last=s == sweep_batch - 1):
                    rb = run_ref[cb, i]
                    r0 = rb * block
                    mask = mask_ref[pl.ds(r0, block), c0:c0 + cblock]
                    lbl = lbl_ref[pl.ds(r0, block), c0:c0 + cblock]
                    up = lbl_rh[2 * rb, c0:c0 + cblock]
                    dn = lbl_rh[2 * rb + 3, c0:c0 + cblock]
                    left = lbl_ch[pl.ds(r0, block), 2 * cb:2 * cb + 1]
                    right = lbl_ch[pl.ds(r0, block), 2 * cb + 3:2 * cb + 4]
                    new_lbl, can = _settle_math(mask, lbl, up, dn, left,
                                                right)
                    lbl_ref[pl.ds(r0, block), c0:c0 + cblock] = new_lbl
                    t = t_ref[pl.ds(r0, block), c0:c0 + cblock]
                    t_ref[pl.ds(r0, block), c0:c0 + cblock] = \
                        jnp.where(can, it, t)
                    # last-sweep-only flags: see _block_body in the 1D kernel
                    # (the 3x3 dilation covers last-sweep changes)
                    if last:
                        flags_ref[rb + 1, cb + 1] = \
                            jnp.any(can).astype(jnp.int32)
                    return 0

                jax.lax.fori_loop(0, cnt_ref[cb], run_i, 0)

        def or_b(rb, a):
            for cb in range(n_cb):
                a = a | flags_ref[rb + 1, cb + 1]
            return a

        changed = jax.lax.fori_loop(0, n_rb, or_b, jnp.int32(0))
        return changed > 0, it0 + sweep_batch

    jax.lax.while_loop(lambda c: c[0] & (c[1] < _MAX_SWEEPS), batch_body,
                       (jnp.bool_(True), jnp.int32(it_start)))


def _settle_tail2d_call(mask, lbl0, t0, block, cblock, sweep_batch, it_start):
    H, W = mask.shape
    n_rb = H // block
    n_cb = W // cblock
    return pl.pallas_call(
        functools.partial(_settle_loop2d_kernel, block=block, cblock=cblock,
                          sweep_batch=sweep_batch, it_start=it_start),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2 * n_rb + 2, W), jnp.int32),
            pltpu.VMEM((H, 2 * n_cb + 2), jnp.int32),
            pltpu.SMEM((n_rb + 2, n_cb + 2), jnp.int32),
            pltpu.SMEM((n_cb, n_rb), jnp.int32),
            pltpu.SMEM((n_cb,), jnp.int32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mask, lbl0, t0)


def _settle_tail_call(mask, lbl0, t0, block, sweep_batch, it_start):
    H, W = mask.shape
    n_blocks = H // block
    return pl.pallas_call(
        functools.partial(_settle_loop_kernel, block=block,
                          sweep_batch=sweep_batch, it_start=it_start),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.int32),
            pltpu.SMEM((n_blocks + 2,), jnp.int32),
            pltpu.SMEM((n_blocks,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mask, lbl0, t0)


def _settle_bulk_call(mask, lbl0, t0, block, n_sweeps):
    H, W = mask.shape
    n_blocks = H // block
    return pl.pallas_call(
        functools.partial(_settle_bulk_kernel, block=block,
                          n_sweeps=n_sweeps),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.int32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mask, lbl0, t0)


def _settle_bulk_call_packed(mask, w0, block, n_sweeps):
    H, W = mask.shape
    n_blocks = H // block
    return pl.pallas_call(
        functools.partial(_settle_bulk_kernel_packed, block=block,
                          n_sweeps=n_sweeps),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.int32),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mask, w0)


def _settle_tail_call_packed(mask, w0, block, sweep_batch, it_start):
    H, W = mask.shape
    n_blocks = H // block
    return pl.pallas_call(
        functools.partial(_settle_loop_kernel_packed, block=block,
                          sweep_batch=sweep_batch, it_start=it_start),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2 * n_blocks + 2, W), jnp.int32),
            pltpu.SMEM((n_blocks + 2,), jnp.int32),
            pltpu.SMEM((n_blocks,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mask, w0)


# Column-tiled settle tail: available via cblock=..., but OFF by default.
# Measured on v5e at 2048^2 (bulk=24): 1D row-gated tail 25.8 ms vs 2D tiles
# 31.9-40.4 ms across (block, cblock, sweep_batch) in {16,32,64}x{256,512}x
# {8,16} — the per-tile-visit overhead (fori dispatch + dynamic sublane
# addressing at ~1024 tiles x ~150 sweeps) outweighs the extra skipping until
# the tail is very sparse (at bulk=96 the 2D tail itself costs ~2 ms, but the
# bulk prologue then dominates). Kept for wider-than-tall mosaics where row
# gating degenerates; auto mode always picks 1D.
_CBLOCK = 256


@functools.partial(jax.jit,
                   static_argnames=("block", "sweep_batch", "bulk_sweeps",
                                    "cblock", "dense_labels"))
def settle_pallas_loop(lam: jnp.ndarray, seeds: jnp.ndarray,
                       block: int = _SETTLE_BLOCK,
                       sweep_batch: int = _SETTLE_SWEEP_BATCH,
                       bulk_sweeps: int | None = None,
                       cblock: int | None = None,
                       dense_labels: bool = False,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Settle = static ungated BULK prologue + batch-gated loop TAIL.

    ``bulk_sweeps`` Jacobi sweeps run first in ``_settle_bulk_kernel`` (every
    block active, static addressing); the gated loop kernel finishes from
    sweep ``bulk_sweeps + 1``. Any prefix of Jacobi sweeps is identical no
    matter which kernel runs it and starting the tail all-active is exact
    (extra visits to converged blocks are no-ops), so the output — including
    arrival stamps — is bit-identical for ANY (block, sweep_batch <= block,
    bulk_sweeps >= 0) setting.

    ``cblock``: column-tile width for the 2D-gated tail
    (``_settle_loop2d_kernel``). None/0 = 1D row-gated tail (measured faster
    at square production shapes — see _CBLOCK note). Also
    bit-identity-invariant.

    ``dense_labels``: hint that seed labels are dense raster ranks — routes
    the 1D path through the packed single-word kernels (~40% less VMEM sweep
    traffic, see the _PACK_* note). Both packed-capacity hazards are guarded
    at runtime with lax.cond fallbacks to the unpacked kernels: labels past
    2^21-3 (possible — a checkerboard's minima are H*W/2 separate 4-CCs) are
    detected from seeds.max() BEFORE any packed sweep runs, and the
    pathological >1022-sweep case (needs a ~H+W-long monotone chain) is
    detected after. Output is bit-identical either way."""
    H, W = lam.shape
    assert sweep_batch <= block and H % block == 0
    if cblock is None:
        cblock = 0
    assert cblock == 0 or (W % cblock == 0 and sweep_batch <= cblock)
    big_t = jnp.int32(1 << 29)
    lbl0 = seeds.astype(jnp.int32)
    t0 = jnp.where(seeds > 0, 0, big_t).astype(jnp.int32)
    mask = _settle_mask(lam.astype(jnp.float32))
    if bulk_sweeps is None:
        bulk_sweeps = _BULK_SWEEPS
    assert bulk_sweeps + sweep_batch < _PACK_T_BIG

    def _unpacked():
        l0, tt0, start = lbl0, t0, 1
        if bulk_sweeps > 0:
            l0, tt0 = _settle_bulk_call(mask, l0, tt0, _bulk_block_for(H),
                                        bulk_sweeps)
            start = bulk_sweeps + 1
        if cblock:
            return _settle_tail2d_call(mask, l0, tt0, block, cblock,
                                       sweep_batch, start)
        return _settle_tail_call(mask, l0, tt0, block, sweep_batch, start)

    if not dense_labels or cblock:
        return _unpacked()

    def _packed(_):
        w0 = jnp.where(seeds > 0, lbl0 + 2,
                       jnp.int32((_PACK_T_BIG << _PACK_SHIFT) | 2))
        it_start = 1
        if bulk_sweeps > 0:
            w0 = _settle_bulk_call_packed(mask, w0, _bulk_block_for(H),
                                          bulk_sweeps)
            it_start = bulk_sweeps + 1
        w, ok = _settle_tail_call_packed(mask, w0, block, sweep_batch,
                                         it_start)

        def _unpack(_):
            enc = w & _PACK_ENC_MASK
            t = w >> _PACK_SHIFT
            return enc - 2, jnp.where(t == _PACK_T_BIG, big_t, t)

        def _stamp_overflow(_):
            return _unpacked()

        return jax.lax.cond(ok[0, 0] > 0, _unpack, _stamp_overflow, 0)

    # labels past 21 bits would overflow into the stamp field — possible at
    # supported shapes (see the _PACK_* note: checkerboard minima are H*W/2
    # dense ranks), so check BEFORE any packed sweep touches the state
    fits = jnp.max(seeds) <= jnp.int32(_PACK_ENC_MASK - 2)
    return jax.lax.cond(fits, _packed, lambda _: _unpacked(), 0)


settle_pallas = settle_pallas_loop
