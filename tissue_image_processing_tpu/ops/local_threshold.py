"""Block-local max thresholding.

TPU-native equivalent of the reference's local threshold
(``basic_image_manipulations.py:468-473``):
``skimage.filters.threshold_local(image, block_size, method='generic',
param=lambda a: imgthresh * a.max())`` — i.e. for every pixel, the threshold is
``imgthresh`` times the max over the surrounding ``block_size`` window
(reflect padding, skimage's default mode).

skimage evaluates the generic function per pixel (O(N * block^2) python calls — one of
the reference's hottest paths); here it is a single windowed max reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["threshold_local_max"]


@functools.partial(jax.jit, static_argnames=("block_size",))
def threshold_local_max(image: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Windowed maximum with reflect padding over the trailing 2 axes.

    ``block_size`` is forced odd like the reference (``basic_image_manipulations.py:470``).
    """
    if block_size % 2 == 0:
        block_size += 1
    r = block_size // 2
    x = image.astype(jnp.float32)
    strides = (1,) * x.ndim
    # max is separable: two 1-D passes instead of a block_size^2 window
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    window = (1,) * (x.ndim - 2) + (block_size, 1)
    x = jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max, window, strides, "VALID")
    pad = [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)]
    xp = jnp.pad(x, pad, mode="reflect")
    window = (1,) * (x.ndim - 2) + (1, block_size)
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max, window, strides, "VALID")
