"""Morphological filters as reduce-window / shift kernels.

TPU-native equivalents of the reference's scipy/skimage morphology call sites:
- ``scipy.ndimage.maximum_filter(labels, (5,5), mode='constant')`` for the neighbor
  graph (reference ``tissue_info.py:1822``) and tracking dilation (``:2081``);
- plus-shaped max/min filters for contact lengths (``tissue_info.py:1080-1085``);
- ``skimage.morphology.dilation/erosion`` with ``np.ones((5,5))`` / ``((7,7))`` in the
  U-Net post-process (``Segmentation/prediction_local.py:169-193``).

Rectangular filters use ``lax.reduce_window`` (XLA lowers these to fast vectorized
window reductions); the plus-shaped (cross) filters are 4 shifted comparisons, which XLA
fuses into a single VPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "maximum_filter",
    "minimum_filter",
    "plus_maximum_filter",
    "plus_minimum_filter",
    "binary_dilation",
    "binary_erosion",
    "grey_dilation",
    "grey_erosion",
    "shift2d",
]


def _reduce_window_2d(x: jnp.ndarray, size, init, op, cval) -> jnp.ndarray:
    """reduce_window over the last two axes with 'constant' (cval) padding.

    Min/max are separable, so a (sy, sx) window runs as two 1-D passes —
    O(sy + sx) instead of O(sy * sx) work per pixel (the reference's 101x101 local
    threshold would otherwise cost 10^4 ops/pixel)."""
    sy, sx = (size, size) if isinstance(size, int) else size
    ry, rx = (sy - 1) // 2, (sx - 1) // 2
    strides = (1,) * x.ndim
    out = x
    if sy > 1:
        pad = [(0, 0)] * (x.ndim - 2) + [(ry, sy - 1 - ry), (0, 0)]
        xp = jnp.pad(out, pad, mode="constant", constant_values=cval)
        window = (1,) * (x.ndim - 2) + (sy, 1)
        out = jax.lax.reduce_window(xp, init, op, window, strides, "VALID")
    if sx > 1:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, 0), (rx, sx - 1 - rx)]
        xp = jnp.pad(out, pad, mode="constant", constant_values=cval)
        window = (1,) * (x.ndim - 2) + (1, sx)
        out = jax.lax.reduce_window(xp, init, op, window, strides, "VALID")
    return out


@functools.partial(jax.jit, static_argnames=("size", "mode"))
def maximum_filter(x: jnp.ndarray, size=3, mode: str = "constant", cval=None) -> jnp.ndarray:
    """scipy.ndimage.maximum_filter with a rectangular footprint over the trailing 2 axes.

    ``mode='constant'`` pads with ``cval`` (default: dtype minimum-compatible 0 like the
    reference's usage on non-negative label maps)."""
    if cval is None:
        cval = jnp.zeros((), x.dtype)
    if mode != "constant":
        raise NotImplementedError("only constant mode is used by the pipeline")
    init = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return _reduce_window_2d(x, size, x.dtype.type(init), jax.lax.max, cval)


@functools.partial(jax.jit, static_argnames=("size", "mode"))
def minimum_filter(x: jnp.ndarray, size=3, mode: str = "constant", cval=None) -> jnp.ndarray:
    if cval is None:
        cval = jnp.zeros((), x.dtype)
    if mode != "constant":
        raise NotImplementedError("only constant mode is used by the pipeline")
    init = jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    return _reduce_window_2d(x, size, x.dtype.type(init), jax.lax.min, cval)


def shift2d(x: jnp.ndarray, dy: int, dx: int, cval) -> jnp.ndarray:
    """Shift the trailing two axes by (dy, dx), filling vacated pixels with ``cval``.
    ``out[y, x] = in[y - dy, x - dx]``."""
    pad = [(0, 0)] * (x.ndim - 2)
    pad += [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    xp = jnp.pad(x, pad, mode="constant", constant_values=cval)
    sl = [slice(None)] * (x.ndim - 2)
    H, W = x.shape[-2], x.shape[-1]
    sl += [slice(max(-dy, 0), max(-dy, 0) + H), slice(max(-dx, 0), max(-dx, 0) + W)]
    return xp[tuple(sl)]


@functools.partial(jax.jit, static_argnames=("cval",))
def plus_maximum_filter(x: jnp.ndarray, cval=0) -> jnp.ndarray:
    """Max over the 4-neighborhood EXCLUDING the center pixel (the reference's
    plus-shaped footprint [[0,1,0],[1,0,1],[0,1,0]], ``tissue_info.py:1080``),
    constant padding."""
    c = x.dtype.type(cval)
    n = shift2d(x, 1, 0, c)
    s = shift2d(x, -1, 0, c)
    e = shift2d(x, 0, 1, c)
    w = shift2d(x, 0, -1, c)
    return jnp.maximum(jnp.maximum(n, s), jnp.maximum(e, w))


@functools.partial(jax.jit, static_argnames=("cval",))
def plus_minimum_filter(x: jnp.ndarray, cval=0) -> jnp.ndarray:
    """Min over the 4-neighborhood EXCLUDING the center (constant padding)."""
    c = x.dtype.type(cval)
    n = shift2d(x, 1, 0, c)
    s = shift2d(x, -1, 0, c)
    e = shift2d(x, 0, 1, c)
    w = shift2d(x, 0, -1, c)
    return jnp.minimum(jnp.minimum(n, s), jnp.minimum(e, w))


@functools.partial(jax.jit, static_argnames=("size",))
def grey_dilation(x: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """skimage.morphology.dilation with a size x size ones footprint; skimage pads
    edges by reflection-equivalent (it uses the image's own border values); we use
    edge-safe minimum init so borders behave like skimage's."""
    # skimage dilation: max over footprint, treating out-of-image as -inf.
    init = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return _reduce_window_2d(x, size, x.dtype.type(init), jax.lax.max, x.dtype.type(init))


@functools.partial(jax.jit, static_argnames=("size",))
def grey_erosion(x: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    init = jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    return _reduce_window_2d(x, size, x.dtype.type(init), jax.lax.min, x.dtype.type(init))


def binary_dilation(x: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    return grey_dilation(x.astype(jnp.float32), size) > 0


def binary_erosion(x: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    return grey_erosion(x.astype(jnp.float32), size) > 0


def binary_closing(x: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """Binary closing (dilate then erode).

    The reference iterates dilation+erosion 101 times
    (``Segmentation/prediction_local.py:169-174``); closing with a flat structuring
    element is idempotent, so a single pass is mathematically identical — one of the
    reference's hot loops collapses to two reduce_windows on TPU."""
    return binary_erosion(binary_dilation(x, size), size)
