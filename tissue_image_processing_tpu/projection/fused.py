"""Fused surface-projection kernels: the whole per-timepoint pipeline in 2 HBM passes.

The unfused projection (projection/surface.py) is a chain of full-volume XLA passes
(uint16 convert, percentile clip, (0.5,1,1) blur, score decimation, score resize,
argmax, one-hot mask build, (1,2,2) mask blur, per-channel multiply+max) — ~25
volume-sized HBM passes, ~13.6 ms/frame at 30x1024^2 where the achievable
memory-bound floor is well under a millisecond. These kernels collapse it to:

- **score pass** (`_score_kernel`): one read of the uint16 reference channel ->
  airyscan offset, p95 clip, fused 3-axis (0.5,1,1) blur, 4x4 mean decimation ->
  writes ONLY the small (Z, Y/4, X/4) score volume. The full-resolution blurred
  volume is never materialized: nothing downstream needs it (the projection
  multiplies the RAW image by the mask; reference surface_projection.py:66-81).
- small-score blur + argmax + bilinear z-map upsample (tiny XLA ops, ~4 MB).
- **project pass** (`_project_kernel`): one read of the raw uint16 channels +
  the (Y, X) z-map -> builds the blurred one-hot z-mask IN VMEM from the z-map
  (9/17/17-tap separable (1,2,2) blur over a halo'd slab; the mask volume never
  touches HBM), multiplies each channel, maxes over z -> (C, Y, X) projection.

Exactness: identical to the `fast=True` path of time_point_surface_projection
except the z-map argmax runs at the decimated score resolution and is bilinearly
upsampled (instead of upsampling the score volume and argmaxing per full-res
pixel). The sigma-30-equivalent score field passes nothing above ~1/60 cycles/px,
so the two orders disagree only on near-ties (measured ~1% of pixels, |dz| <= 1,
same tolerance class as fast mode itself — asserted in tests).

Reference parity: surface_projection.py:17-85 ('max_averages' method, bin_size 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_projection", "fused_projection_supported"]

_VMEM_LIMIT = 100 * 1024 * 1024
_BY = 64  # row-slab height
_DEC = 4  # score decimation


def _taps(sigma: float, truncate: float = 4.0):
    radius = int(truncate * float(sigma) + 0.5)
    if radius <= 0 or sigma <= 0:
        return (1.0,)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return tuple((k / k.sum()).astype(np.float32).tolist())


def fused_projection_supported(shape) -> bool:
    """(C, Z, Y, X) with Y % 64 == 0, X % 128 == 0, X % 4 == 0, modest Z."""
    if len(shape) != 4:
        return False
    _, Z, Y, X = shape
    return (Y % _BY == 0 and X % 128 == 0 and Y % _DEC == 0 and X % _DEC == 0
            and Z <= 64 and Y >= 2 * _BY)


def _blur_decimate_matrix(taps, n_out, pad_before):
    """(n_in, n_out) banded matrix folding 1-D blur taps AND _DEC-wide mean
    decimation into one MXU matmul: out[o] = mean_d sum_t taps[t] *
    in[pad_before - r + _DEC*o + d + t], the blur-then-pool of an input padded
    by ``pad_before`` on the leading edge. One builder serves both axes
    (Mosaic has no lane-splitting reshape, so in-kernel decimation rides the
    systolic array instead)."""
    r = len(taps) // 2
    n_in = pad_before - r + _DEC * (n_out - 1) + (_DEC - 1) + len(taps)
    M = np.zeros((n_in, n_out), np.float32)
    for t, w in enumerate(taps):
        for d in range(_DEC):
            M[pad_before - r + np.arange(n_out) * _DEC + d + t,
              np.arange(n_out)] += w / _DEC
    return M, n_in


def _decimating_blur_matrix(kx, X, Xp):
    """(Xp, X//_DEC) x-axis fold: the slab is padded by rx on the left and up
    to Xp on the right, so pad_before = rx and extra right-pad columns carry
    zero weight."""
    rx = len(kx) // 2
    M, n_in = _blur_decimate_matrix(kx, X // _DEC, pad_before=rx)
    assert n_in <= Xp
    return np.pad(M, ((0, Xp - n_in), (0, 0)))


def _pool_blur_matrix(ky, ry_pad):
    """(_BY/_DEC, _BY + 2*ry_pad) y-axis fold, TRANSPOSED for left-multiply
    (out rows = pooled y): the slab carries ry_pad rows per side, so
    pad_before = ry_pad (the score consumer only ever sees the pooled planes,
    so full-res y rows never need to exist)."""
    M, n_in = _blur_decimate_matrix(ky, _BY // _DEC, pad_before=ry_pad)
    assert n_in <= _BY + 2 * ry_pad
    return np.pad(M, ((0, _BY + 2 * ry_pad - n_in), (0, 0))).T


def _make_score_kernel(Z, X, kz, ky, kx, airyscan_offset, ry_pad):
    rz, ry, rx = len(kz) // 2, len(ky) // 2, len(kx) // 2
    Xp = X + 2 * rx
    Xp += (-Xp) % 128

    def kernel(p95_ref, xp_hbm, my_ref, mx_ref, out_ref, slab, fbuf, sem):
        i = pl.program_id(0)
        # uint16 DMA slices need 16-row sublane granularity: the slab is padded
        # to ry_pad (8) rows per side even though the y kernel radius is ry (4)
        cp = pltpu.make_async_copy(
            xp_hbm.at[:, pl.ds(i * _BY, _BY + 2 * ry_pad), :], slab, sem)
        cp.start()
        p95 = p95_ref[0]
        cp.wait()
        # plane-wise processing: every live value is 2-D (full-slab f32
        # EXPRESSIONS spill registers; explicit per-plane writes into the
        # fbuf VMEM scratch do not).
        # Convert each input plane ONCE — u16 -> f32 via i32 (Mosaic has no
        # direct u16->f32 cast), airyscan offset, p95 clip (clip-to-value like
        # the reference: values above p95 are SET to p95,
        # surface_projection.py:33-36). The old per-output z-loop re-converted
        # every plane len(kz) times (150 plane passes instead of 34 at Z=30).
        for zi in range(Z + 2 * rz):
            v = slab[zi].astype(jnp.int32).astype(jnp.float32)
            if airyscan_offset:
                v = jnp.maximum(v - airyscan_offset, 0.0)
            fbuf[zi] = jnp.minimum(v, p95)
        my = my_ref[...]
        mx = mx_ref[...]
        for zo in range(Z):
            zacc = None
            for t, w in enumerate(kz):
                term = w * fbuf[zo + t]
                zacc = term if zacc is None else zacc + term
            # y-blur + y-mean-pool as one matmul, then x-blur + x-decimation
            # as another (2-D dots: the only matmul form Mosaic guarantees) —
            # the 9-tap y blur used to run on the VPU over full-width rows
            yz = jax.lax.dot(my, zacc, preferred_element_type=jnp.float32)
            out_ref[zo] = jax.lax.dot(yz, mx,
                                      preferred_element_type=jnp.float32)

    return kernel, rz, ry, rx, Xp


@functools.partial(jax.jit, static_argnames=("airyscan_offset",))
def _score_pass(vol_u16: jnp.ndarray, p95: jnp.ndarray,
                airyscan_offset: float = 0.0) -> jnp.ndarray:
    """(Z, Y, X) uint16 -> (Z, Y/4, X/4) f32 fully-decimated clipped blurred
    score volume (the 4x4 mean pool is folded into the kernel's y/x matmuls,
    so the full-resolution blurred planes never exist anywhere)."""
    Z, Y, X = vol_u16.shape
    kz, ky, kx = _taps(0.5), _taps(1.0), _taps(1.0)
    ry_pad = 8
    kernel, rz, ry, rx, Xp = _make_score_kernel(Z, X, kz, ky, kx, airyscan_offset,
                                                ry_pad)
    xp = jnp.pad(vol_u16, ((rz, rz), (ry_pad, ry_pad), (rx, rx + Xp - X - 2 * rx)),
                 mode="edge")
    my = jnp.asarray(_pool_blur_matrix(ky, ry_pad))
    mx = jnp.asarray(_decimating_blur_matrix(kx, X, Xp))
    return pl.pallas_call(
        kernel,
        grid=(Y // _BY,),
        out_shape=jax.ShapeDtypeStruct((Z, Y // _DEC, X // _DEC), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Z, _BY // _DEC, X // _DEC), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Z + 2 * rz, _BY + 2 * ry_pad, Xp), jnp.uint16),
            pltpu.VMEM((Z + 2 * rz, _BY + 2 * ry_pad, Xp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(jnp.reshape(p95.astype(jnp.float32), (1,)), xp, my, mx)


def _make_project_kernel(C, Z, X, kz, ky, kx, airyscan_offset, ref_channel,
                         atoh_shift):
    rz, ry, rx = len(kz) // 2, len(ky) // 2, len(kx) // 2
    Xp = X + 2 * rx
    Xp += (-Xp) % 128

    def kernel(z_hbm, img_hbm, out_ref, zslab, img_slab, sem, sem2):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            z_hbm.at[pl.ds(i * _BY, _BY + 2 * ry), :], zslab, sem)
        cp.start()
        cp2 = pltpu.make_async_copy(
            img_hbm.at[:, :, pl.ds(i * _BY, _BY), :], img_slab, sem2)
        cp2.start()
        cp.wait()
        relz = zslab[...]  # (BY + 2ry, Xp) int32
        relz_s = jnp.clip(relz + atoh_shift, 0, Z - 1) if atoh_shift else relz
        cp2.wait()

        # One z-plane per fori_loop step: every live value is 2-D ((BYp, Xp) at
        # most) and the body compiles once, so the kernel stack stays small —
        # building the full 3-D blurred mask as a vector value needed 134 MB of
        # register spill slots, and even a 30x-unrolled 2-D loop kept 124 MB of
        # stack live.
        def plane_mask(rz_map, z):
            # z-blur of the one-hot z-mask in closed form: tap t of plane z
            # reads one-hot plane clip(z+t-rz) -> one 2-D compare per tap
            # (the clip reproduces gaussian_blur's nearest-pad z boundary)
            m = None
            for t, w in enumerate(kz):
                zt = jnp.clip(z + (t - rz), 0, Z - 1)
                term = w * (rz_map == zt).astype(jnp.float32)
                m = term if m is None else m + term
            my = None
            for t, w in enumerate(ky):
                term = w * m[t:t + _BY]
                my = term if my is None else my + term
            mx = None
            for t, w in enumerate(kx):
                term = w * my[:, t:t + X]
                mx = term if mx is None else mx + term
            return mx  # (BY, X)

        # every contribution v*m is >= 0, so max-accumulating from 0 is exact
        out_ref[...] = jnp.zeros((C, _BY, X), jnp.float32)

        def masks_at(z):
            m = plane_mask(relz, z)
            return (m, plane_mask(relz_s, z) if atoh_shift else m)

        def plane_contrib(c, z, masks):
            m, m_s = masks
            mm = m if (not atoh_shift or c == ref_channel) else m_s
            v = img_slab[c, pl.ds(z, 1)][0].astype(jnp.int32).astype(
                jnp.float32)
            if airyscan_offset:
                v = jnp.maximum(v - airyscan_offset, 0.0)
            return v * mm

        # content gating: a plane z contributes iff some pixel's (possibly
        # shifted) z-map lands within the z-blur radius — |z - relz| <= rz
        # for some tap (plane_mask's compares are all-zero otherwise) — so
        # only [min(relz) - rz, max(relz) + rz] needs computing. Tissue
        # surfaces span a few z per 64-row block, so this typically skips
        # most of the stack. Exact by construction (skipped planes are 0).
        r_lo, r_hi = jnp.min(relz), jnp.max(relz)
        if atoh_shift:
            r_lo = jnp.minimum(r_lo, jnp.min(relz_s))
            r_hi = jnp.maximum(r_hi, jnp.max(relz_s))
        zlo = jnp.maximum(r_lo - rz, 0)
        zhi = jnp.minimum(r_hi + rz, Z - 1)

        # two z-planes per step: their mask/contribution chains are independent,
        # so the VPU overlaps them; one read-modify-write of out_ref per pair.
        # An odd-length range recomputes plane zhi twice (zb clamps to zhi) —
        # max-accumulation is idempotent, so the duplicate is free of effect.
        def body(z2, carry):
            za = zlo + z2 * 2
            zb = jnp.minimum(za + 1, zhi)
            ma = masks_at(za)
            mb = masks_at(zb)
            for c in range(C):
                contrib = jnp.maximum(plane_contrib(c, za, ma),
                                      plane_contrib(c, zb, mb))
                out_ref[c] = jnp.maximum(out_ref[c], contrib)
            return carry

        jax.lax.fori_loop(0, (zhi - zlo + 2) // 2, body, 0)

    return kernel, rz, ry, rx, Xp


@functools.partial(jax.jit, static_argnames=("airyscan_offset", "ref_channel",
                                             "atoh_shift"))
def _project_pass(img_u16: jnp.ndarray, rel_z: jnp.ndarray,
                  airyscan_offset: float = 0.0, ref_channel: int = 0,
                  atoh_shift: int = 0) -> jnp.ndarray:
    """(C, Z, Y, X) uint16 + (Y, X) int32 z-map -> (C, Y, X) f32 projection."""
    C, Z, Y, X = img_u16.shape
    kz, ky, kx = _taps(1.0), _taps(2.0), _taps(2.0)
    kernel, rz, ry, rx, Xp = _make_project_kernel(
        C, Z, X, kz, ky, kx, airyscan_offset, ref_channel, atoh_shift)
    zp = jnp.pad(rel_z.astype(jnp.int32), ((ry, ry), (rx, rx + Xp - X - 2 * rx)),
                 mode="edge")
    return pl.pallas_call(
        kernel,
        grid=(Y // _BY,),
        out_shape=jax.ShapeDtypeStruct((C, Y, X), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((C, _BY, X), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_BY + 2 * ry, Xp), jnp.int32),
            pltpu.VMEM((C, Z, _BY, X), jnp.uint16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(zp, img_u16)


def fused_projection(image: jnp.ndarray, reference_channel: int = 0,
                     airyscan: bool = False, airyscan_offset: float = 10000.0,
                     atoh_shift: int = 0):
    """Full 'max_averages' surface projection in two fused HBM passes.

    Args:
      image: (C, Z, Y, X) uint16 (or any dtype; converted on device read).
      Returns (projection (C, Y, X) f32, chosen_z (Y, X) int32) like
      time_point_surface_projection.
    """
    from tissue_image_processing_tpu.ops.filters import (
        gaussian_blur, resize_bilinear)
    from tissue_image_processing_tpu.ops.percentile import masked_percentile

    C, Z, Y, X = image.shape
    img_u16 = image.astype(jnp.uint16)
    off = airyscan_offset if airyscan else 0.0
    ref = img_u16[reference_channel]
    # p95 of the positive pixels from a 1-in-16 whole-ROW subsample
    # (30x1024^2 -> 2M samples; the full-volume order statistic differs by
    # O(1e-2) percentile noise, far below the clip's effect on the smoothed
    # score). Whole rows, NOT a ::4,::4 grid: element-strided gathers crawl on TPU
    # (the ::4,::4 grid cost ~0.8 ms/frame; contiguous rows ~0.05 — the
    # bisection itself is only ~0.2 ms, probe_p95.py). Rows are spatially
    # representative across planes; estimator noise is the same O(1e-2)
    # percentile class as any 2M-of-31M subsample.
    sub = ref[:, ::16, :].astype(jnp.float32)
    if off:
        sub = jnp.maximum(sub - off, 0.0)
    p95 = masked_percentile(sub, sub > 0, 95.0)
    small = _score_pass(ref, p95, airyscan_offset=off)  # (Z, Y/4, X/4)
    score = gaussian_blur(small, (0.5, 30.0 / _DEC, 30.0 / _DEC), fast=True)
    rel_small = jnp.argmax(score, axis=0).astype(jnp.float32)
    rel_z = jnp.round(resize_bilinear(rel_small, (Y, X))).astype(jnp.int32)
    rel_z = jnp.clip(rel_z, 0, Z - 1)
    proj = _project_pass(img_u16, rel_z, airyscan_offset=off,
                         ref_channel=reference_channel, atoh_shift=atoh_shift)
    return proj, rel_z
