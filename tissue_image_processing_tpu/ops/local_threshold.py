"""Block-local max thresholding.

TPU-native equivalent of the reference's local threshold
(``basic_image_manipulations.py:468-473``):
``skimage.filters.threshold_local(image, block_size, method='generic',
param=lambda a: imgthresh * a.max())`` — i.e. for every pixel, the threshold is
``imgthresh`` times the max over the surrounding ``block_size`` window
(reflect padding, skimage's default mode).

skimage evaluates the generic function per pixel (O(N * block^2) python calls — one of
the reference's hottest paths); here it is a separable sliding max computed by the
log-doubling trick: max is idempotent, so the window-w max is
``max(f_K(i), f_K(i + w - 2^K))`` where ``f_k`` (the window-``2^k`` max) doubles via
``f_k(i) = max(f_{k-1}(i), f_{k-1}(i + 2^{k-1}))`` — ~2*log2(w) shift+max passes per
axis instead of XLA's O(w)-per-pixel ``reduce_window`` lowering (measured ~4x at
block_size=101; overlapping windows make idempotent doubling exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["threshold_local_max"]


def _sliding_max_1d(x: jnp.ndarray, window: int, axis: int) -> jnp.ndarray:
    """Centered window-``window`` max along ``axis`` with reflect padding
    (skimage ``threshold_local`` default mode), window odd."""
    r = window // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="reflect")
    n = xp.shape[axis]

    def fwd(arr, start, length):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(start, start + length)
        return arr[tuple(idx)]

    # f_k = max over [i, i + 2^k): doubling passes (arrays shrink as we go)
    f = xp
    size = 1
    while size * 2 <= window:
        valid = f.shape[axis] - size
        f = jnp.maximum(fwd(f, 0, valid), fwd(f, size, valid))
        size *= 2
    # combine two (overlapping) 2^K windows into the exact window-w max
    shift = window - size
    valid = n - window + 1
    return jnp.maximum(fwd(f, 0, valid), fwd(f, shift, valid))


@functools.partial(jax.jit, static_argnames=("block_size",))
def threshold_local_max(image: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Windowed maximum with reflect padding over the trailing 2 axes.

    ``block_size`` is forced odd like the reference (``basic_image_manipulations.py:470``).
    """
    if block_size % 2 == 0:
        block_size += 1
    x = image.astype(jnp.float32)
    x = _sliding_max_1d(x, block_size, x.ndim - 2)
    return _sliding_max_1d(x, block_size, x.ndim - 1)
