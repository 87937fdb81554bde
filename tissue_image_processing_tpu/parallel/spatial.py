"""Space-axis sharding: the projection stencils over a ("frame", "y", "x") mesh.

SURVEY §5.8's planned mesh has spatial axes so that (a) a device count
larger than T still scales and (b) production frames (1600-2000 px) shard
spatially. The frame-only mesh (parallel/pipeline.py) covers (a) up to T
devices; this module shards the memory-heavy projection stages — the raw
(C, Z, Y, X) stack is ~50x the projected output — over rows AND columns:

- the 95%-clip percentile becomes a DISTRIBUTED exact order statistic: the
  order-isomorphic int32 bisection of ops/percentile.py with each of the 32
  compare+count passes reduced by ``psum`` over ("y", "x") (one scalar
  collective per step over ICI), mirroring the unsharded subsampling policy
  above _EXACT_SORT_LIMIT;
- every stencil (the sigma (0.5,1,1) pre-blur, the sigma (0.5,30,30) score
  blur, the sigma (1,2,2) one-hot mask blur) exchanges a ROW halo over ``y``
  and a COLUMN halo over ``x`` of its own input via ``ppermute`` (edge shards
  edge-replicate, matching the unsharded blurs' 'nearest' boundary); the
  separable blur makes the corner halo unnecessary: the row pass runs on the
  column-extended block first, so corner contributions arrive through the
  column halo (see _blur_with_halo);
- argmax-z, the z-mask product and the per-channel max-projection are
  pointwise in (y, x) — no collectives.

Halo math: each stage exchanges the halo of ITS OWN input — 4 px for the
sigma-1 pre-blur, 120 px for the sigma-30 score blur, 8 px for the int
height map. Folding them into one raw-input exchange would be cheaper but
WRONG at global edges: the unsharded composition blur2(blur1(x)) edge-pads
blur1's OUTPUT, which is not blur1 of edge-padded input (measured 3%
divergence near edges). Duplicated stencil work is halo/px_per_shard per
stage and axis (~6% for the big blur at 2000 px rows on 8 row-shards; a
2x4 ("y","x") split of the same frame halves that). When a halo exceeds the
shard extent (tiny dry-run shapes), the exchange falls back to a tiled
``all_gather`` + static slice — same result, more ICI traffic.

The manifold builder stays unsharded (its BFS wavefront advances one global
pixel ring per step — sharding it would serialize on a collective per ring);
``max_std``/``multi_channel`` scoring and ``bin_size > 1`` run unsharded too
(they only differ under ``bin_size > 1``, whose block-reduce + global
bilinear resize is not worth a distributed rewrite for a preview-resolution
path). ``sharded_projection`` covers the default production configuration
(method='max_averages', bin_size=1, no manifold) — the same one the fused
single-chip kernel accelerates (projection/fused.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tissue_image_processing_tpu.ops.filters import gaussian_blur
from tissue_image_processing_tpu.ops.percentile import _EXACT_SORT_LIMIT

__all__ = ["make_space_mesh", "sharded_projection", "masked_percentile_psum",
           "clip_percentile_sharded"]

def make_space_mesh(n_devices: Optional[int] = None,
                    frame_shards: Optional[int] = None,
                    x_shards: int = 1) -> Mesh:
    """("frame", "y", "x") mesh. ``frame_shards`` defaults to 1; the leftover
    devices split over rows, with ``x_shards`` of them on columns. The product
    chooses frame_shards = min(T, n) and space for the rest."""
    devices = jax.devices()
    n = n_devices or len(devices)
    f = frame_shards or 1
    if n % (f * x_shards):
        raise ValueError(f"frame_shards {f} x x_shards {x_shards} must divide "
                         f"device count {n}")
    return Mesh(np.array(devices[:n]).reshape(f, n // (f * x_shards), x_shards),
                ("frame", "y", "x"))


def masked_percentile_psum(x: jnp.ndarray, mask: jnp.ndarray, q,
                           axis_name: str) -> jnp.ndarray:
    """Exact percentile of ``x[mask]`` over ALL shards of ``axis_name``.

    Distributed twin of ops/percentile.py's order-statistic bisection: f32
    values map to an order-isomorphic int32 key; 32 binary-search steps each
    count ``key <= mid`` locally and ``psum`` the count. Exact (no
    subsampling) — at sharded sizes the count pass is bandwidth-trivial and
    the collective is one scalar."""
    flat = x.astype(jnp.float32).ravel()
    m = mask.ravel()
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
    key = jnp.where(bits < 0, jnp.int32(-1) - (bits & jnp.int32(0x7FFFFFFF)),
                    bits)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = jnp.where(m, key, big)
    n = jax.lax.psum(jnp.sum(m.astype(jnp.int32)), axis_name)
    q = jnp.asarray(q, dtype=jnp.float32)
    pos = q / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                  jnp.maximum(n - 1, 0))
    frac = pos - jnp.floor(pos)

    def find(rank):
        def step(state, _):
            lo_k, hi_k = state
            mid = (lo_k & hi_k) + ((lo_k ^ hi_k) >> 1)
            cnt = jax.lax.psum(jnp.sum((key <= mid).astype(jnp.int32)),
                               axis_name)
            take_lo = cnt >= rank + 1
            return (jnp.where(take_lo, lo_k, mid),
                    jnp.where(take_lo, mid, hi_k)), None

        init = (jnp.int32(jnp.iinfo(jnp.int32).min), big)
        (_, hi_k), _ = jax.lax.scan(step, init, None, length=32)
        imin = jnp.int32(jnp.iinfo(jnp.int32).min)
        b = jnp.where(hi_k < 0, (jnp.int32(-1) - hi_k) + imin, hi_k)
        return jax.lax.bitcast_convert_type(b, jnp.float32)

    v_lo = find(lo)
    v_hi = find(jnp.minimum(lo + 1, jnp.maximum(n - 1, 0)))
    val = v_lo * (1.0 - frac) + v_hi * frac
    return jnp.where(n > 0, val, 0.0)


def clip_percentile_sharded(ref: jnp.ndarray, mask: jnp.ndarray, q,
                            y_axis: str, x_axis: Optional[str] = None
                            ) -> jnp.ndarray:
    """Percentile of a space-sharded (Z, Yl, Xl) volume matching the UNSHARDED
    ``ops.percentile.masked_percentile`` at every size: above
    ``_EXACT_SORT_LIMIT`` global elements the unsharded path takes the
    percentile on a strided row subsample, so select the SAME global rows here
    (global row number = z * Y_global + y_global) before the exact distributed
    bisection — otherwise the sharded and single-chip clip values (and hence
    argmax-z and the zmap) diverge at production sizes (~40 x 2000^2)."""
    n_y = jax.lax.axis_size(y_axis)
    n_x = jax.lax.axis_size(x_axis) if x_axis else 1
    names = (y_axis, x_axis) if x_axis else y_axis
    Z, Yl, Xl = ref.shape
    Xg = Xl * n_x
    total = Z * Yl * n_y * Xg
    if total > _EXACT_SORT_LIMIT:
        stride = -(-total // _EXACT_SORT_LIMIT)
        iy = jax.lax.axis_index(y_axis)
        gy = iy * Yl + jnp.arange(Yl, dtype=jnp.int32)[None, :]
        grow = jnp.arange(Z, dtype=jnp.int32)[:, None] * (Yl * n_y) + gy
        if Xg >= 128:  # whole-row subsample (the unsharded fast path):
            # every x-fragment of a selected global row is selected
            mask = mask & ((grow % stride) == 0)[..., None]
        else:          # element-strided subsample
            ix = jax.lax.axis_index(x_axis) if x_axis else 0
            gx = ix * Xl + jnp.arange(Xl, dtype=jnp.int32)
            gflat = grow[..., None] * Xg + gx
            mask = mask & ((gflat % stride) == 0)
    return masked_percentile_psum(ref, mask, q, names)


def _halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str):
    """Extend the row axis (second-to-last) by ``halo`` on both sides with the
    neighboring shards' rows; global edges edge-replicate (the blurs'
    'nearest' boundary). One ``ppermute`` pair when the halo fits in one
    shard; tiled ``all_gather`` + static slice otherwise (tiny shards)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    Yl = x.shape[-2]
    rep_top = jnp.repeat(x[..., :1, :], halo, axis=-2)
    rep_bot = jnp.repeat(x[..., -1:, :], halo, axis=-2)
    if n == 1:
        return jnp.concatenate([rep_top, x, rep_bot], axis=-2)
    if halo <= Yl:
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        top = jax.lax.ppermute(x[..., -halo:, :], axis_name, fwd)
        bot = jax.lax.ppermute(x[..., :halo, :], axis_name, bwd)
        top = jnp.where(idx == 0, rep_top, top)
        bot = jnp.where(idx == n - 1, rep_bot, bot)
        return jnp.concatenate([top, x, bot], axis=-2)
    # halo spans multiple shards: gather the full axis (small by construction
    # when this triggers) and slice the needed window per shard
    full = jax.lax.all_gather(x, axis_name, axis=x.ndim - 2, tiled=True)
    full = jnp.concatenate([jnp.repeat(full[..., :1, :], halo, axis=-2),
                            full,
                            jnp.repeat(full[..., -1:, :], halo, axis=-2)],
                           axis=-2)
    start = idx * Yl  # window [start, start + halo + Yl + halo) in padded coords
    return jax.lax.dynamic_slice_in_dim(full, start, halo + Yl + halo,
                                        axis=x.ndim - 2)


def _halo_exchange_cols(x: jnp.ndarray, halo: int, axis_name: str):
    """Column twin of :func:`_halo_exchange_rows` (last axis)."""
    xt = jnp.swapaxes(x, -1, -2)
    return jnp.swapaxes(_halo_exchange_rows(xt, halo, axis_name), -1, -2)


def _halo_extend(vol: jnp.ndarray, halo: int, y_axis: str,
                 x_axis: Optional[str]):
    """Extend rows over ``y_axis`` and (if sharded) columns over ``x_axis``.

    Column exchange runs FIRST on the unextended rows, then the row exchange
    carries the already-column-extended block — so the corner regions arrive
    through the neighbor's column halo and no diagonal ppermute is needed.
    """
    if x_axis is not None:
        vol = _halo_exchange_cols(vol, halo, x_axis)
    return _halo_exchange_rows(vol, halo, y_axis)


def _blur_with_halo(vol: jnp.ndarray, sigmas, halo: int, y_axis: str,
                    x_axis: Optional[str] = None):
    """Blur a (Z, Yl, Xl) space shard with the given (z, y, x) sigmas:
    exchange a ``halo``-px halo of the CURRENT field in each sharded spatial
    axis (so global edges replicate this field's edge pixels — exactly the
    unsharded blur's 'nearest' boundary, which pads each stage's own input),
    blur the extended block, crop."""
    Yl, Xl = vol.shape[-2], vol.shape[-1]
    ext = _halo_extend(vol, halo, y_axis, x_axis)
    out = gaussian_blur(ext, sigmas)[..., halo:halo + Yl, :]
    return out[..., halo:halo + Xl] if x_axis is not None else out


def _project_block(img: jnp.ndarray, y_axis: str, x_axis: Optional[str],
                   reference_channel: int, airyscan: bool,
                   airyscan_offset: float, atoh_shift: int):
    """One frame's projection over a (C, Z, Yl, Xl) space shard. Mirrors
    time_point_surface_projection (method='max_averages', precise kernels)
    stage for stage; each stencil exchanges its own halo (the composition
    blur2(blur1(x)) under 'nearest' pads blur1's OUTPUT at the global edge,
    so halos cannot be folded into one raw-input exchange without changing
    edge values). ``x_axis=None`` means columns are unsharded."""
    img = img.astype(jnp.float32)
    if airyscan:
        img = jnp.maximum(img - airyscan_offset, 0.0)
    channels, z_size = img.shape[0], img.shape[1]

    ref = img[reference_channel]
    p95 = clip_percentile_sharded(ref, ref > 0, 95.0, y_axis, x_axis)
    ref = jnp.where((ref > p95) & (p95 > 0), p95, ref)
    # radius = int(4*sigma + 0.5) (scipy), per stage
    ref = _blur_with_halo(ref, (0.5, 1.0, 1.0), 4, y_axis, x_axis)
    score = _blur_with_halo(ref, (0.5, 30.0, 30.0), 120, y_axis, x_axis)
    rel_z = jnp.argmax(score, axis=0).astype(jnp.int32)
    rel_z_atoh = jnp.clip(rel_z + atoh_shift, 0, z_size - 1)

    zidx = jnp.arange(z_size, dtype=jnp.int32).reshape(z_size, 1, 1)

    def blur_onehot(rz):
        # one-hot of the halo-extended height map == halo-extension of the
        # one-hot volume, so exchanging the small int map suffices
        Yl, Xl = rz.shape[-2], rz.shape[-1]
        rz_ext = _halo_extend(rz[None], 8, y_axis, x_axis)[0]
        m = (zidx == rz_ext[None]).astype(jnp.float32)
        m = gaussian_blur(m, (1.0, 2.0, 2.0))[:, 8:8 + Yl, :]
        return m[:, :, 8:8 + Xl] if x_axis is not None else m

    mask = blur_onehot(rel_z)
    mask_atoh = mask if atoh_shift == 0 else blur_onehot(rel_z_atoh)

    def project_channel(c_img, use_ref_mask):
        m = jnp.where(use_ref_mask, mask, mask_atoh)
        return jnp.max(c_img * m, axis=0)

    is_ref = jnp.arange(channels) == reference_channel
    projection = jax.vmap(project_channel)(img, is_ref)
    return projection, rel_z


def sharded_projection(
    mesh: Mesh,
    reference_channel: int = 0,
    airyscan: bool = False,
    airyscan_offset: float = 10000.0,
    atoh_shift: int = 0,
):
    """Build a jitted ``fn(movie) -> (projections, zmaps)`` with frames sharded
    over ``frame``, rows over ``y`` and (when the mesh has an ``x`` axis of
    size > 1) columns over ``x``.

    ``movie``: (T, C, Z, Y, X); T divisible by the frame axis, Y by the y
    axis, X by the x axis. Output matches ``time_point_surface_projection(...,
    precise=True, airyscan=..., atoh_shift=...)`` exactly, including at edges
    (each stencil exchanges its own halo of its own input) and at production
    sizes above ``_EXACT_SORT_LIMIT`` (the 95%-clip mirrors the unsharded
    strided-row subsampling policy, selecting the same global rows; parity
    tests in tests/test_parallel_spatial.py). Reference pipeline:
    ``surface_projection.py:17-85``.
    """
    has_x = "x" in mesh.shape
    x_axis = "x" if has_x and mesh.shape["x"] > 1 else None
    # a size-1 x axis still needs to appear in the specs when the mesh has it
    x_spec = "x" if has_x else None

    def shard_fn(movie_shard):  # (T/nf, C, Z, Y/ny, X/nx)
        def one_frame(stack):
            return _project_block(stack, "y", x_axis, reference_channel,
                                  airyscan, airyscan_offset, atoh_shift)

        return jax.lax.map(one_frame, movie_shard)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P("frame", None, None, "y", x_spec),
        out_specs=(P("frame", None, "y", x_spec), P("frame", "y", x_spec)),
        check_vma=False)
    return jax.jit(fn)
