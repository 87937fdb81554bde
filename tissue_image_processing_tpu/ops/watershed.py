"""Watershed segmentation with watershed lines, recast for TPU.

TPU-native replacement for ``skimage.segmentation.watershed(image, watershed_line=True)``
as used by the reference (``basic_image_manipulations.py:475``,
``Segmentation/prediction_local.py:194``). skimage's implementation is a sequential
priority-queue flood — inherently serial. Here the flood is reformulated as a
two-phase data-parallel relaxation:

1. **Seeds**: regional minima (equal-valued plateaus with no lower 8-neighbor),
   4-connected components, labeled in raster order — the same marker order skimage
   derives via ``ndi.label(local_minima(image))``.
2. **Flood levels (phase 1)**: label-free Bellman-Ford under the (min, max) semiring
   computes lam[p] = minimax path elevation from any seed to p. Needed because
   skimage finds minima 8-connected but floods 4-connected, so some pockets flood
   *downhill* through a pass; lam is exactly the level at which Meyer's heap
   reaches each pixel.
3. **Settle (phase 2)**: pixels settle in ascending (lam, arrival) order — Meyer's
   pop order. A pixel settles once every strictly-lower-lam neighbor has settled;
   it takes the label of its earliest-popped donor, becomes a watershed-line pixel
   when donors disagree (lines never donate — this stops fronts leaking across
   saddles), or a void when nothing can ever reach it.
4. **Lines**: a post-pass marks boundaries by lexicographic (lam, t, index) order,
   matching where skimage's colliding wavefronts leave a 0-line up to heap ties.

Both phases run either as XLA while_loops of fused VPU shift/compare sweeps, or —
on TPU for images that fit VMEM — as single Pallas kernels that keep all state
on-chip across every sweep (ops/flood_pallas.py; ~10x over the XLA path).

Agreement with skimage semantics is validated in tests/test_watershed_drift.py
against an exact sequential Meyer flood (native/watershed.cpp): 99.6-99.9% exact
pixel agreement, Dice 0.992-0.999 per cell on representative membrane images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tissue_image_processing_tpu.ops.components import connected_components
from tissue_image_processing_tpu.ops.filters import gaussian_blur
from tissue_image_processing_tpu.ops.local_threshold import threshold_local_max
from tissue_image_processing_tpu.ops.morphology import shift2d

__all__ = ["regional_minima_labels", "watershed", "watershed_batch",
           "watershed_segmentation", "watershed_segmentation_batch"]

_NBRS4 = [(1, 0), (-1, 0), (0, 1), (0, -1)]
_NBRS8 = _NBRS4 + [(1, 1), (1, -1), (-1, 1), (-1, -1)]


def _nbr_val(img2d: jnp.ndarray, dy: int, dx: int, cval) -> jnp.ndarray:
    """Value of the neighbor at offset (dy, dx): out[p] = img[p + (dy, dx)]."""
    return shift2d(img2d, -dy, -dx, cval)


FORCE_PALLAS = None  # tests may force True/False; None = auto (TPU + size fits)


def _pallas_enabled(shape) -> bool:
    if FORCE_PALLAS is not None:
        return bool(FORCE_PALLAS)
    from tissue_image_processing_tpu.ops.flood_pallas import pallas_flood_supported
    try:
        return jax.default_backend() == "tpu" and pallas_flood_supported(shape)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("use_pallas", "scan", "binary"))
def regional_minima_labels(image: jnp.ndarray,
                           use_pallas: bool | None = None,
                           scan: bool = False,
                           binary: bool = False) -> jnp.ndarray:
    """Label regional minima plateaus 1..N in raster order (0 elsewhere).

    ``use_pallas``: None = auto (TPU backend + size fits VMEM). Pass True/False
    explicitly to pin the path — it is a static argument, so unlike a module flag it
    correctly retraces instead of silently reusing the other path's cached trace.

    ``scan``: route the two CC diffusions through the segmented-scan kernel —
    the right tool when minima plateaus are image-scale (binary boundary maps,
    where the background sea otherwise needs ~diameter sweeps: 58 ms at 2048^2);
    leave off for smooth images whose plateaus converge in a few gated sweeps.

    ``binary``: the image is a {0, c} boundary map (+inf pad allowed). Every
    zero plateau is then a regional minimum (0 is the global min, so no lower
    neighbor exists) and none can escape (an escape needs an equal-valued
    non-candidate neighbor, but every zero pixel is a candidate), so minima
    are exactly the 4-connected components of the zero set — plus, for a
    degenerate zero-free frame, its whole finite region (see the inline
    note). This skips the
    min8/escaping-plateau machinery whose "bad"-flag diffusion must otherwise
    traverse the image-spanning positive band of a dilated boundary map
    (measured 12.3 ms -> 2.1 ms at 1024^2 on the unet_postprocess boundary).
    """
    img = image.astype(jnp.float32)
    inf = jnp.float32(jnp.inf)
    if binary:
        candidate = img == 0
        # A frame with NO zeros at all (a degenerate boundary map that is
        # all-c) is itself one regional minimum under the general semantics:
        # a c-plateau with no lower neighbor. Within one rectangular frame
        # this is the ONLY such case — any c-component coexisting with zeros
        # in the same rectangle is 8-adjacent to some zero (its in-rectangle
        # complement is the zero set) and hence escapes. Frames are bounded
        # by all-inf separator/pad ROWS (watershed_batch bands, bottom pad),
        # so detect "has a zero" per row-segment and seed the whole finite
        # region of zero-free segments.
        finite = img < inf
        finite_row = finite.any(axis=1)
        zero_row = candidate.any(axis=1)
        seg_id = jnp.cumsum((~finite_row).astype(jnp.int32))
        seg_any = (jnp.zeros((img.shape[0] + 1,), jnp.int32)
                   .at[seg_id].max(zero_row.astype(jnp.int32)))
        candidate = candidate | (finite & (seg_any[seg_id] == 0)[:, None])
        bad = jnp.zeros(img.shape, bool)
    else:
        # separable 8-neighbor min: row-min3, then rows above/below contribute
        # their row-min while the centre row contributes only left/right — 7
        # shifted arrays instead of 8, and the row-min reuse lets XLA fuse the
        # whole thing in ~half the passes of the naive 8-shift form
        rm = jnp.minimum(jnp.minimum(_nbr_val(img, 0, -1, inf), img),
                         _nbr_val(img, 0, 1, inf))
        min8 = jnp.minimum(
            jnp.minimum(_nbr_val(rm, -1, 0, inf), _nbr_val(rm, 1, 0, inf)),
            jnp.minimum(_nbr_val(img, 0, -1, inf), _nbr_val(img, 0, 1, inf)))
        # non-finite pixels (pad bands, stacked-frame separators) can never be
        # minima; excluding them HERE keeps them out of the CC diffusion
        # entirely — an all-inf band is otherwise one giant plateau needing
        # ~W sweeps to settle
        candidate = (img <= min8) & (img < inf)
        # a candidate adjacent (8) to an equal-valued non-candidate belongs to
        # an escaping plateau -> its whole component is not a regional minimum.
        # Separable form (vs the naive 8 x (2 shifts + eq + mask) loop): for a
        # CANDIDATE p every 8-neighbor q has img_q >= img_p, and an equal
        # non-candidate neighbor is exactly an "escaping" pixel
        # (min8_q < img_q; the img_q = inf case is impossible at
        # img_q == img_p < inf). With h = img where escaping else +inf, all h
        # values in p's 9-neighborhood are >= img_p (p's own h is +inf:
        # candidates never escape), so min9(h) == img equivalently tests
        # "some equal escaping neighbor" — a 9-point separable min (4 shifted
        # passes) instead of 16 shifted passes.
        h = jnp.where(min8 < img, img, inf)
        rm_h = jnp.minimum(jnp.minimum(_nbr_val(h, 0, -1, inf), h),
                           _nbr_val(h, 0, 1, inf))
        min9_h = jnp.minimum(jnp.minimum(_nbr_val(rm_h, -1, 0, inf), rm_h),
                             _nbr_val(rm_h, 1, 0, inf))
        bad = min9_h == img
    if use_pallas is None:
        use_pallas = _pallas_enabled(image.shape)
    if use_pallas:
        from tissue_image_processing_tpu.ops.flood_pallas import cc_diffusion_pallas

        # fold the component-wide "escaping plateau" test into the CC diffusion:
        # flagged pixels seed with (idx - n), so any component touching one comes
        # out NEGATIVE (min over the component), while clean components keep their
        # root index — no separate scatter/membership pass
        H, W = image.shape
        n = H * W
        idx2 = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
        init = jnp.where(bad & candidate, idx2 - n, idx2)
        # minima plateaus of a blurred float image are a few px across, so the
        # diffusions converge in ~1-2 gated batches — the default 24-sweep
        # all-active bulk prologue is mostly no-op sweeps at 2048^2-class
        # sizes (~0.1 ms each). The fixpoint is prologue-invariant.
        cc_bulk = 8
        comp = cc_diffusion_pallas(candidate, init=init, scan=scan,
                                   bulk_sweeps=cc_bulk)
        # dense raster-order 1..N labels via a SECOND diffusion: roots
        # (self-pointing pixels of clean components) seed their prefix-count
        # rank and the component min propagates it — a 1M random gather
        # (relabel_roots) costs ~8 ms at ~300 MB/s while another VMEM diffusion
        # costs ~0.2 ms
        ok = comp >= 0
        is_root = ok & (comp == idx2)
        # raster-order rank of each root: two-level prefix sum. Cumsums run
        # as MXU matmuls against a lower-triangular ones matrix — XLA lowers
        # jnp.cumsum to reduce_window/log-passes on the VPU (the 2-level
        # cumsum form measured 6.2 ms at 2048^2 in isolation), while an
        # (H, W) @ (W, W) f32 matmul is ~0.3 ms and counts stay exact in f32
        # (row counts <= W, total roots <= H*W/2 < 2^24 even at the
        # checkerboard worst case)
        tri = jnp.tril(jnp.ones((W, W), jnp.float32)).T  # tri[j, i] = j <= i
        rootf = is_root.astype(jnp.float32)
        row = jnp.dot(rootf, tri, preferred_element_type=jnp.float32)
        rtot = row[:, -1]
        # level 2 is a tiny (H,) scan — not worth an (H, H) triangle (H can
        # be 4352 for stacked frames: 75 MB + a 165-GFLOP f32 matmul)
        rowtot = jnp.cumsum(rtot)
        rank = (row + (rowtot - rtot)[:, None]).astype(jnp.int32)
        init2 = jnp.where(is_root, rank, jnp.int32(n))
        seeds = cc_diffusion_pallas(ok, init=init2, scan=scan,
                                    bulk_sweeps=cc_bulk)
        return jnp.where(seeds > 0, seeds, 0).astype(jnp.int32)
    # dense 1..N in raster order; shift to root-style [0, N) with -1 background
    comp_flat = connected_components(candidate, connectivity=1).ravel() - 1
    # component-wide "escaping plateau" test: scatter flagged component ids into a
    # boolean table, then one gather membership-tests every pixel (a sorted
    # searchsorted membership test costs a 20-level binary search = 20 full gathers)
    n = comp_flat.shape[0]
    flagged = (bad & candidate).ravel()
    bad_tab = jnp.zeros((n + 1,), jnp.bool_).at[
        jnp.where(flagged, comp_flat, n)].set(True, mode="drop")
    keep = ~bad_tab[jnp.clip(comp_flat, 0, n)]
    seeds = jnp.where((comp_flat >= 0) & keep, comp_flat, -1).reshape(image.shape)
    # compact to 1..N preserving raster order
    from tissue_image_processing_tpu.ops.components import relabel_sequential
    return relabel_sequential(seeds, background=-1)


@functools.partial(jax.jit, static_argnames=("watershed_line", "use_pallas",
                                             "minima_scan", "binary"))
def watershed(image: jnp.ndarray, markers: jnp.ndarray | None = None,
              watershed_line: bool = True,
              use_pallas: bool | None = None,
              minima_scan: bool = False,
              binary: bool = False) -> jnp.ndarray:
    """Flood ``image`` from its regional minima (or from ``markers`` if given).

    Returns int32 labels 1..N; with ``watershed_line`` the one-pixel separating lines
    are 0, matching the reference's label-map contract (``tissue_info.py:424``).

    ``use_pallas``: None = auto (TPU backend + size fits VMEM); True/False pins the
    path as a static arg so both variants can coexist in the jit cache.

    ``binary``: promise that ``image`` is a {0, c} boundary map (c > 0 constant;
    +inf pad bands allowed). Seeds are then the 4-connected components of the
    zero set (plus the whole finite region of a degenerate zero-free frame,
    which is its own regional minimum — see ``regional_minima_labels``) and
    the Bellman-Ford
    flood phase is skipped entirely: the minimax path level lam(p) equals
    img(p) exactly — a zero pixel reaches its own seed at level 0, and any
    path from a positive pixel peaks at c (the only positive value), so
    lam = img — which removes the two dominant phases of the flood on the
    U-Net post-process path (measured 13.0 -> ~4 ms at 1024^2).

    Unaligned shapes (the reference's movies are 1600-2000 px,
    ``split_large_movies.ijm:11,44``) are padded with +inf to the next
    (64, 128)-aligned size and cropped back: the +inf plateau produces no seeds
    (it is an escaping plateau), never donates to or gates any finite-lam pixel,
    so labels in the real region are unchanged (asserted vs the XLA path in
    tests).
    """
    from tissue_image_processing_tpu.ops.flood_pallas import pallas_flood_supported

    H, W = image.shape
    Hp = -(-H // 64) * 64
    Wp = -(-W // 128) * 128
    if use_pallas is None:
        # auto mode gates on the PADDED shape: unaligned images (the
        # reference's 1600-2000 px movies) must take the pad-and-crop Pallas
        # path, not silently fall to the ~10x slower XLA sweeps
        use_pallas = _pallas_enabled((Hp, Wp))
    if use_pallas and not pallas_flood_supported((H, W)):
        if pallas_flood_supported((Hp, Wp)):
            img_p = jnp.pad(image.astype(jnp.float32),
                            ((0, Hp - H), (0, Wp - W)),
                            constant_values=jnp.inf)
            mk_p = (None if markers is None else
                    jnp.pad(markers, ((0, Hp - H), (0, Wp - W))))
            out = _watershed_core(img_p, mk_p, watershed_line, True,
                                  minima_scan, binary)
            return out[:H, :W]
        use_pallas = False
    return _watershed_core(image, markers, watershed_line, use_pallas,
                           minima_scan, binary)


_STACK_SEP = 16  # inf rows between stacked frames; >=1 isolates the 4-neighbor
# flood and the (8-neighbor, 1-px reach) minima detection across frames


@functools.partial(jax.jit, static_argnames=("watershed_line", "use_pallas",
                                             "binary", "minima_scan"))
def watershed_batch(images: jnp.ndarray, watershed_line: bool = True,
                    use_pallas: bool | None = None,
                    binary: bool = False,
                    minima_scan: bool = False) -> jnp.ndarray:
    """Flood B frames in ONE Pallas launch by stacking them along rows.

    The flood kernels' sweep count is set by content (plateau diameters, line
    chains) while each late sweep touches only the few still-active row blocks —
    so most of a frame's flood tail is fixed per-sweep loop/flag overhead.
    Stacking B frames with +inf separator bands makes the total sweep count the
    MAX over frames instead of the SUM, amortizing that overhead B-fold, and
    replaces B kernel launches with one. +inf bands produce no seeds (excluded
    from minima candidacy), never donate (inf > any finite lam), and settle
    quiet immediately, so per-frame labels are bit-identical to the per-frame
    path: seeds are numbered in raster order, hence contiguous per frame, and a
    per-frame offset subtraction restores 1..N_k numbering.

    When the full B-stack exceeds the VMEM budget, the batch is split into
    the largest equal chunks whose sub-stacks still fit, ``lax.map``'ed over
    one Pallas launch each (e.g. B=8 at 1024^2 runs as 2 launches of 4) —
    only off TPU does it fall to the per-frame XLA sweep path.
    """
    B, H, W = images.shape
    if B == 1:
        return watershed(images[0], watershed_line=watershed_line,
                         use_pallas=use_pallas, binary=binary,
                         minima_scan=minima_scan)[None]
    from tissue_image_processing_tpu.ops.flood_pallas import pallas_flood_supported

    requested = use_pallas
    Wp = -(-W // 128) * 128
    slot = H + _STACK_SEP
    tail = (-(B * slot)) % 64
    Hs = B * slot + tail
    if use_pallas is None:
        use_pallas = _pallas_enabled((Hs, Wp))
    if not (use_pallas and pallas_flood_supported((Hs, Wp))):
        on_tpu = (requested if requested is not None
                  else jax.default_backend() == "tpu")
        if on_tpu:
            for pb in range(B - 1, 1, -1):
                hs = pb * slot + ((-(pb * slot)) % 64)
                if not pallas_flood_supported((hs, Wp)):
                    continue
                # largest fitting chunk; a non-divisor pb leaves a smaller
                # remainder chunk (its own stacked launch) so prime batch
                # sizes (e.g. B=7 -> 4+3) still amortize sweeps instead of
                # degrading to B single-frame launches
                n_full, rem = divmod(B, pb)
                sub = functools.partial(
                    watershed_batch, watershed_line=watershed_line,
                    use_pallas=requested, binary=binary,
                    minima_scan=minima_scan)
                out = jax.lax.map(
                    sub, images[:n_full * pb].reshape(n_full, pb, H, W)
                ).reshape(n_full * pb, H, W)
                if rem:
                    out = jnp.concatenate([out, sub(images[n_full * pb:])], 0)
                return out
        return jax.lax.map(
            lambda im: watershed(im, watershed_line=watershed_line,
                                 use_pallas=requested, binary=binary,
                                 minima_scan=minima_scan), images)
    inf = jnp.float32(jnp.inf)
    fr = jnp.pad(images.astype(jnp.float32),
                 ((0, 0), (0, _STACK_SEP), (0, Wp - W)), constant_values=inf)
    stacked = fr.reshape(B * slot, Wp)
    if tail:
        stacked = jnp.pad(stacked, ((0, tail), (0, 0)), constant_values=inf)
    out = _watershed_core(stacked, None, watershed_line, True,
                          minima_scan=minima_scan, binary=binary)
    labs = out[:B * slot].reshape(B, slot, Wp)[:, :H, :W]
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    mins = jnp.min(jnp.where(labs > 0, labs, big).reshape(B, -1), axis=1)
    off = jnp.where(mins == big, 0, mins - 1)
    return jnp.where(labs > 0, labs - off[:, None, None], 0)


def _watershed_core(image: jnp.ndarray, markers: jnp.ndarray | None,
                    watershed_line: bool, use_pallas: bool,
                    minima_scan: bool = False,
                    binary: bool = False) -> jnp.ndarray:
    H, W = image.shape
    img = image.astype(jnp.float32)
    inf = jnp.float32(jnp.inf)

    # dense raster ranks from regional_minima_labels are USUALLY small, but
    # the worst case is H*W/2 (checkerboard minima) — past the packed
    # settle's 21-bit label field — so settle_pallas guards seeds.max() at
    # runtime and falls back to the unpacked kernels (flood_pallas _PACK_*
    # note); user markers carry arbitrary values -> unpacked always
    dense_labels = markers is None
    if markers is None:
        markers = regional_minima_labels(img, use_pallas=use_pallas,
                                         scan=minima_scan, binary=binary)
    seeds = markers.astype(jnp.int32)

    seeded = seeds > 0
    big_t = jnp.int32(jnp.iinfo(jnp.int32).max // 2)

    # --- phase 1: flood level lam(p) = min over paths from any seed of the maximum
    # elevation along the path (the level at which the sequential flood reaches p).
    # Label-free Bellman-Ford under the (min, max) semiring; needed because skimage
    # finds minima with 8-connectivity but floods with 4-connectivity, so pockets
    # reachable only diagonally from their minimum flood *downhill* through a pass.
    # On a {0, c} binary map lam = img exactly (watershed docstring), so the
    # whole phase is skipped. (A positive region sealed off by +inf bands with
    # no interior seed truly has lam = inf, not c — but it also has no donors
    # either way, so it settles void = 0 under both lam values.)
    if binary and dense_labels:  # user markers need real BF even on binary
        lam = img
        q_lam = [_nbr_val(lam, dy, dx, inf) for dy, dx in _NBRS4]
    elif use_pallas:
        from tissue_image_processing_tpu.ops.flood_pallas import bf_flood_pallas

        lam = bf_flood_pallas(img, seeds)
        q_lam = [_nbr_val(lam, dy, dx, inf) for dy, dx in _NBRS4]
    else:
        lam0 = jnp.where(seeded, img, inf)

        def bf_body(state):
            lam, _ = state
            new = lam
            for dy, dx in _NBRS4:
                ql = _nbr_val(new, dy, dx, inf)
                new = jnp.minimum(new, jnp.maximum(ql, img))
            return new, jnp.any(new != lam)

        lam, _ = jax.lax.while_loop(lambda s: s[1], bf_body,
                                    (lam0, jnp.bool_(True)))
        q_lam = [_nbr_val(lam, dy, dx, inf) for dy, dx in _NBRS4]

    # --- phase 2: settle in ascending (lam, arrival) order — Meyer's pop order. A
    # pixel settles once every strictly-lower-lam neighbor has settled; at settle it
    # looks at all earlier-popped labeled neighbors: one distinct label -> take it,
    # two or more -> it is a watershed-line pixel (label 0, never donates — this is
    # what stops a front from leaking across a saddle into the next basin), none ->
    # void (unreached, like skimage pixels sealed off behind lines).
    if use_pallas:
        from tissue_image_processing_tpu.ops.flood_pallas import settle_pallas

        lbl_raw, t = settle_pallas(lam, seeds, dense_labels=dense_labels)
        lbl = jnp.maximum(lbl_raw, 0)
        return _apply_lines(lbl, t, lam, q_lam, H, W, big_t, watershed_line, img)

    state0 = dict(
        lbl=seeds,
        settled=seeded,
        t=jnp.where(seeded, 0, big_t),
        it=jnp.int32(1),
        changed=jnp.bool_(True),
    )

    def _one_sweep(state):
        lbl, settled, t = state["lbl"], state["settled"], state["t"]
        ready = jnp.ones((H, W), bool)
        all_settled_eq = jnp.ones((H, W), bool)
        minl = jnp.full((H, W), jnp.iinfo(jnp.int32).max, jnp.int32)
        maxl = jnp.zeros((H, W), jnp.int32)
        for (dy, dx), qv in zip(_NBRS4, q_lam):
            ql = _nbr_val(lbl, dy, dx, 0)
            qs = _nbr_val(settled, dy, dx, True)
            ready = ready & ((~(qv < lam)) | qs)
            all_settled_eq = all_settled_eq & ((~(qv <= lam)) | qs)
            donor = qs & (ql > 0) & (qv <= lam)
            minl = jnp.where(donor, jnp.minimum(minl, ql), minl)
            maxl = jnp.where(donor, jnp.maximum(maxl, ql), maxl)
        has_donor = maxl > 0
        conflict = has_donor & (minl != maxl)
        settle_lbl = (~settled) & ready & has_donor & (~conflict)
        settle_line = (~settled) & ready & conflict
        # void: nothing can ever donate (all <=lam neighbors settled, none labeled)
        settle_void = (~settled) & ready & (~has_donor) & all_settled_eq
        can = settle_lbl | settle_line | settle_void
        # the taken label needs no (lam, t) priority tie-break: it only
        # applies in the no-conflict branch, where all donors agree — maxl IS
        # the donated label (identical to the old best-donor tracking)
        return dict(
            lbl=jnp.where(settle_lbl, maxl, jnp.where(can, 0, lbl)),
            settled=settled | can,
            t=jnp.where(can, state["it"], t),
            it=state["it"] + 1,
            changed=jnp.any(can),
        )

    state = jax.lax.while_loop(lambda s: s["changed"], _one_sweep, state0)
    lbl, t = state["lbl"], state["t"]
    lbl = jnp.where(state["settled"], lbl, 0)
    return _apply_lines(lbl, t, lam, q_lam, H, W, big_t, watershed_line, img)


def _apply_lines(lbl, t, lam, q_lam, H, W, big_t, watershed_line, img):
    if not watershed_line:
        # fill line/void pixels from their earliest labeled neighbor
        def fill_cond(s):
            return s[1]

        def fill_body(s):
            cur, _ = s
            best = jnp.zeros((H, W), jnp.int32)
            bv = jnp.full((H, W), jnp.inf, jnp.float32)
            for (dy, dx), qv in zip(_NBRS4, q_lam):
                ql = _nbr_val(cur, dy, dx, 0)
                take = (ql > 0) & (qv < bv)
                best = jnp.where(take, ql, best)
                bv = jnp.where(take, qv, bv)
            new = jnp.where((cur == 0) & (best > 0), best, cur)
            return new, jnp.any(new != cur)

        lbl, _ = jax.lax.while_loop(fill_cond, fill_body, (lbl, jnp.bool_(True)))
    else:
        # simultaneous equal-(lam, t) meetings leave both sides labeled — flag the
        # later one ((lam, t, index) order) as line like skimage's collision rule
        n = H * W
        idx2d = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
        line = jnp.zeros((H, W), bool)
        for (dy, dx), qv in zip(_NBRS4, q_lam):
            ql = _nbr_val(lbl, dy, dx, 0)
            qt = _nbr_val(t, dy, dx, big_t)
            qi = _nbr_val(idx2d, dy, dx, n)
            earlier = (
                (qv < lam)
                | ((qv == lam) & (qt < t))
                | ((qv == lam) & (qt == t) & (qi < idx2d))
            )
            line = line | ((ql != lbl) & (ql > 0) & (lbl > 0) & earlier)
        lbl = jnp.where(line, 0, lbl)
    return lbl


@functools.partial(jax.jit, static_argnames=("block_size", "std"))
def watershed_segmentation(image: jnp.ndarray, imgthresh: float, std: float,
                           block_size: int) -> jnp.ndarray:
    """Classic segmentation pipeline matching the reference's active
    ``watershed_segmentation`` (``basic_image_manipulations.py:446-476``):
    local-max threshold -> zero dim pixels -> Gaussian blur -> watershed with lines."""
    img = image.astype(jnp.float32)
    thr = imgthresh * threshold_local_max(img, block_size)
    seg = jnp.where(img < thr, 0.0, img)
    blurred = gaussian_blur(seg, float(std))
    return watershed(blurred, watershed_line=True)


@functools.partial(jax.jit, static_argnames=("block_size", "std"))
def watershed_segmentation_batch(images: jnp.ndarray, imgthresh: float,
                                 std: float, block_size: int) -> jnp.ndarray:
    """Batched ``watershed_segmentation``: per-frame threshold + blur (vmapped),
    then ONE stacked flood for the whole batch (``watershed_batch``)."""

    def pre(img):
        img = img.astype(jnp.float32)
        thr = imgthresh * threshold_local_max(img, block_size)
        return gaussian_blur(jnp.where(img < thr, 0.0, img), float(std))

    return watershed_batch(jax.vmap(pre)(images), watershed_line=True)
