"""Separable Gaussian filtering and difference-of-Gaussians band-pass.

TPU-native equivalents of the reference's filter kernels
(``basic_image_manipulations.py:373-414`` — ``blur_image`` via
``scipy.ndimage.gaussian_filter(mode='nearest')`` and ``band_pass_filter`` via
``skimage.filters.difference_of_gaussians``).

Design: an N-D Gaussian is separable, so we run one 1-D correlation per axis with
edge-replicate padding. Each pass is expressed as ``lax.conv_general_dilated`` over a
flattened batch so XLA maps it onto the TPU convolution units and fuses the padding.
Kernel radius matches scipy: ``radius = int(truncate * sigma + 0.5)`` with
``truncate = 4.0``.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Union  # noqa: F401

import jax
import jax.numpy as jnp

__all__ = ["gaussian_kernel1d", "gaussian_blur", "band_pass_filter"]


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """1-D Gaussian kernel identical to scipy.ndimage's (normalized, radius
    ``int(truncate*sigma + 0.5)``)."""
    radius = int(truncate * float(sigma) + 0.5)
    if radius <= 0 or sigma <= 0:
        return jnp.ones((1,), dtype=jnp.float32)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _band_matrix_nearest(kernel: jnp.ndarray, length: int) -> jnp.ndarray:
    """(L, L) matrix B with out = x @ B.T == correlate1d(x, kernel, mode='nearest').

    Edge-replication folds the out-of-range kernel mass onto the first/last columns:
    B[i, j] = sum of kernel taps d with clip(i + d, 0, L-1) == j.
    """
    ksize = kernel.shape[0]
    r = (ksize - 1) // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
    d = j - i
    base = jnp.where(jnp.abs(d) <= r, kernel[jnp.clip(d + r, 0, ksize - 1)], 0.0)
    csum = jnp.cumsum(kernel)
    total = csum[-1]
    rows = jnp.arange(length)
    left = jnp.where(r - rows - 1 >= 0, csum[jnp.clip(r - rows - 1, 0, ksize - 1)], 0.0)
    hi = length - 1 - rows + r
    right = jnp.where(hi < ksize - 1, total - csum[jnp.clip(hi, 0, ksize - 1)], 0.0)
    base = base.at[:, 0].add(left)
    base = base.at[:, length - 1].add(right)
    return base


# kernels with at least this many taps run as a banded matmul on the MXU: a
# radius-120 Gaussian (sigma 30) over 30x1024^2 is ~15 GFLOP of 1-channel conv (VPU
# bound, hundreds of ms) but a dense (1024, 1024) matmul per row block (sub-10ms)
_MATMUL_TAP_THRESHOLD = 31


def _correlate1d_nearest(x: jnp.ndarray, kernel: jnp.ndarray, axis: int,
                         precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Correlate ``x`` with ``kernel`` along ``axis`` using edge-replicate padding."""
    ksize = kernel.shape[0]
    if ksize == 1:
        return x
    r = (ksize - 1) // 2
    L = x.shape[axis]
    if ksize >= _MATMUL_TAP_THRESHOLD and L > 1 and L <= 8192:
        B = _band_matrix_nearest(kernel.astype(jnp.float32), L)
        xm = jnp.moveaxis(x, axis, -1)
        shape = xm.shape
        out = jnp.dot(xm.reshape(-1, L), B.T, preferred_element_type=jnp.float32,
                      precision=precision)
        return jnp.moveaxis(out.reshape(shape), -1, axis)
    # small kernels: shift-and-add over an edge-padded array, sliced along the
    # native axis (no transposes). XLA fuses the ksize offset reads + FMAs into one
    # elementwise pass; a 1-channel conv_general_dilated lowers to a VPU sliding
    # window at ~2% of HBM roofline (~50 ms per sigma~1 pass over 30x1024^2 vs a
    # few ms for this form).
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, mode="edge")
    kern = kernel.astype(jnp.float32)
    out = None
    for t in range(ksize):
        term = kern[t] * jax.lax.slice_in_dim(xp, t, t + L, axis=axis)
        out = term if out is None else out + term
    return out


def _box_sizes_for_gaussian(sigma: float, n: int = 4):
    """n box-filter widths whose cascade approximates a Gaussian of the given sigma
    (Kovesi's 'fast almost-Gaussian' construction)."""
    w_ideal = math.sqrt(12.0 * sigma * sigma / n + 1.0)
    wl = int(math.floor(w_ideal))
    if wl % 2 == 0:
        wl -= 1
    wu = wl + 2
    m_ideal = (12 * sigma * sigma - n * wl * wl - 4 * n * wl - 3 * n) / \
        (-4 * wl - 4)
    m = int(round(m_ideal))
    return [wl] * m + [wu] * (n - m)


def _box_blur_axis(x: jnp.ndarray, width: int, axis: int) -> jnp.ndarray:
    """Normalized box filter along an axis (edge-replicate) via cumulative sums —
    O(1) per pixel regardless of width, no matmuls/convs to autotune."""
    if width <= 1:
        return x
    r = width // 2
    L = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r + 1, r)
    xp = jnp.pad(x, pads, mode="edge")
    cs = jnp.cumsum(xp, axis=axis)
    hi = jax.lax.slice_in_dim(cs, width, width + L, axis=axis)
    lo = jax.lax.slice_in_dim(cs, 0, L, axis=axis)
    return (hi - lo) / width


FORCE_PALLAS_BLUR = None  # tests may force True/False; None = auto (TPU + fits)


def _maybe_blur3d_pallas(image, std, truncate, fast):
    """Route small-kernel 2-D/3-D blurs through the fused Pallas kernel on TPU.

    One HBM read + one write instead of one volume materialization per tap pass
    (~6x at 30x1024^2). Returns None when unsupported (large taps go to the box
    cascade / banded matmul; non-TPU backends use the XLA shift-add path).
    """
    if image.ndim not in (2, 3):
        return None
    std3 = (0.0,) * (3 - image.ndim) + std
    if fast and any(s >= 6.0 for s in std3):
        return None  # large sigmas: box cascade is the right tool
    if FORCE_PALLAS_BLUR is None:
        try:
            if jax.default_backend() != "tpu":
                return None
        except Exception:
            return None
    elif not FORCE_PALLAS_BLUR:
        return None
    from tissue_image_processing_tpu.ops.blur_pallas import (
        blur3d_pallas, blur3d_pallas_supported)
    # host-side taps (std/truncate are static): under jit the jnp kernel builder
    # yields tracers, but the pallas kernel needs the weights as Python constants
    import numpy as _np

    def taps(sigma):
        radius = int(truncate * float(sigma) + 0.5)
        if radius <= 0 or sigma <= 0:
            return (1.0,)
        xs = _np.arange(-radius, radius + 1, dtype=_np.float32)
        k = _np.exp(-0.5 * (xs / _np.float32(sigma)) ** 2).astype(_np.float32)
        return tuple(float(v) for v in (k / k.sum()))

    kernels = [taps(s) for s in std3]
    shape3 = (1,) * (3 - image.ndim) + image.shape
    if not blur3d_pallas_supported(shape3, tuple(len(k) for k in kernels)):
        return None
    vol = image.reshape(shape3)
    out = blur3d_pallas(vol, *kernels)
    return out.reshape(image.shape)


@functools.partial(jax.jit, static_argnames=("std", "truncate", "fast"))
def gaussian_blur(
    image: jnp.ndarray,
    std: Union[float, Sequence[float]],
    truncate: float = 4.0,
    fast: bool = False,
) -> jnp.ndarray:
    """Gaussian blur matching ``scipy.ndimage.gaussian_filter(image, std, mode='nearest')``
    (the reference's ``blur_image``, ``basic_image_manipulations.py:373-390``).

    ``std`` may be a scalar (applied to every axis) or one value per axis; it must be a
    static (Python) value since it determines kernel sizes. ``fast=True`` approximates
    large-sigma axes (>= 8) with a 4-box cumsum cascade (error < ~0.5% of the exact
    Gaussian) — right for scoring paths where only the argmax matters; the exact path
    costs a large banded matmul whose server-side autotune dominated compile time.
    """
    if not hasattr(std, "__len__"):
        std = (float(std),) * image.ndim
    std = tuple(float(s) for s in std)
    if len(std) != image.ndim:
        raise ValueError(f"std {std} does not match image ndim {image.ndim}")
    out = image.astype(jnp.float32)
    fused = _maybe_blur3d_pallas(out, std, truncate, fast)
    if fused is not None:
        return fused
    for axis, sigma in enumerate(std):
        # box cascade only where it wins: along SHORT axes the exact banded
        # matmul is both exact and ~4x faster (a (256,256) band rides the MXU;
        # the 4-box cascade is 4 cumsum+slice passes — measured 2.63 ms vs
        # 0.61 ms for the fused-projection score blur at (30,256,256)), while
        # at 1024+-length axes the band matrix's O(L^2) wins flip.
        if fast and sigma >= 6.0 and out.shape[axis] > 512:
            for width in _box_sizes_for_gaussian(sigma):
                out = _box_blur_axis(out, width, axis)
            continue
        kernel = gaussian_kernel1d(sigma, truncate)
        out = _correlate1d_nearest(out, kernel, axis)
    return out


@functools.partial(jax.jit, static_argnames=("low_sigma", "high_sigma", "truncate"))
def band_pass_filter(
    image: jnp.ndarray,
    low_sigma: float,
    high_sigma: float,
    truncate: float = 4.0,
) -> jnp.ndarray:
    """Difference-of-Gaussians band-pass, matching the semantics of
    ``skimage.filters.difference_of_gaussians`` used by the reference
    (``basic_image_manipulations.py:393-414``): blur with the small and large sigma
    and subtract."""
    lo = gaussian_blur(image, low_sigma, truncate)
    hi = gaussian_blur(image, high_sigma, truncate)
    return lo - hi


def block_reduce(image: jnp.ndarray, block: Sequence[int], func: str = "mean") -> jnp.ndarray:
    """Downsample by non-overlapping blocks (pad with zeros to a multiple first), matching
    ``skimage.measure.block_reduce`` semantics used by the projection scorer
    (reference ``surface_projection.py:41-51``).

    ``func``: "mean" or "var" (population variance, like ``np.var``).
    """
    block = tuple(int(b) for b in block)
    if len(block) != image.ndim:
        raise ValueError("block rank mismatch")
    pads = []
    for dim, b in zip(image.shape, block):
        rem = (-dim) % b
        pads.append((0, rem))
    x = jnp.pad(image, pads, mode="constant", constant_values=0)
    new_shape = []
    for dim, b in zip(x.shape, block):
        new_shape.extend([dim // b, b])
    x = x.reshape(new_shape)
    axes = tuple(range(1, x.ndim, 2))
    if func == "mean":
        return jnp.mean(x, axis=axes)
    elif func == "var":
        return jnp.var(x, axis=axes)
    elif func == "max":
        return jnp.max(x, axis=axes)
    raise ValueError(f"unknown reduce func {func}")


def resize_bilinear(image: jnp.ndarray, shape: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize via jax.image (used where the reference calls
    ``skimage.transform.resize``, e.g. ``surface_projection.py:60,64``)."""
    return jax.image.resize(image.astype(jnp.float32), tuple(shape), method="linear")
