"""Sub-pixel global drift via FFT phase correlation.

TPU-native replacement for ``skimage.registration.phase_cross_correlation(...,
upsample_factor=100)`` used by the reference's drift chain
(``basic_image_manipulations.py:522-536``, ``tissue_info.py:1940-2035``).

Implements the Guizar-Sicairos upsampled-DFT refinement: the coarse peak comes from an
inverse FFT of the (phase-)normalized cross-power spectrum; the sub-pixel peak is found
by evaluating the DFT on a small upsampled grid around it with two small matrix
multiplies — MXU-friendly, no giant zero-padded FFT.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["phase_cross_correlation", "calculate_drift"]


def _upsampled_dft(data: jnp.ndarray, region: int, upsample: float,
                   offsets: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """Evaluate the inverse DFT of ``data`` on an upsampled (region x region) grid
    whose top-left corner is at ``offsets`` (in upsampled pixels)."""
    H, W = data.shape
    off_y, off_x = offsets

    def kernel(n, offset):
        # (region, n) complex kernel
        freqs = jnp.fft.ifftshift(jnp.arange(n, dtype=jnp.float32) - jnp.floor(n / 2.0))
        samples = jnp.arange(region, dtype=jnp.float32)[:, None] - offset
        return jnp.exp(-1j * 2.0 * jnp.pi / (n * upsample) * samples * freqs[None, :])

    ky = kernel(H, off_y)  # (region, H)
    kx = kernel(W, off_x)  # (region, W)
    return ky @ data @ kx.T


@functools.partial(jax.jit, static_argnames=("upsample_factor", "normalization"))
def phase_cross_correlation(
    reference: jnp.ndarray,
    moving: jnp.ndarray,
    upsample_factor: int = 1,
    normalization: str = "phase",
) -> jnp.ndarray:
    """Return (shift_y, shift_x): the shift to apply to ``moving`` so it registers with
    ``reference`` (skimage sign convention)."""
    a = reference.astype(jnp.float32)
    b = moving.astype(jnp.float32)
    F1 = jnp.fft.fft2(a)
    F2 = jnp.fft.fft2(b)
    R = F1 * jnp.conj(F2)
    if normalization == "phase":
        R = R / jnp.maximum(jnp.abs(R), 1e-20)
    cc = jnp.fft.ifft2(R)
    H, W = a.shape
    peak = jnp.argmax(jnp.abs(cc))
    py = (peak // W).astype(jnp.float32)
    px = (peak % W).astype(jnp.float32)
    py = jnp.where(py > H / 2, py - H, py)
    px = jnp.where(px > W / 2, px - W, px)
    if upsample_factor <= 1:
        return jnp.stack([py, px])

    u = float(upsample_factor)
    py = jnp.round(py * u) / u
    px = jnp.round(px * u) / u
    region = int(math.ceil(u * 1.5))
    dftshift = float(math.trunc(region / 2.0))
    off_y = dftshift - py * u
    off_x = dftshift - px * u
    cc_up = _upsampled_dft(jnp.conj(R), region, u, (off_y, off_x))
    mag = jnp.abs(cc_up)
    pk = jnp.argmax(mag)
    my = (pk // region).astype(jnp.float32) - dftshift
    mx = (pk % region).astype(jnp.float32) - dftshift
    return jnp.stack([py + my / u, px + mx / u])


def calculate_drift(first_image: jnp.ndarray, second_image: jnp.ndarray,
                    sub_pixel_precision: bool = True) -> jnp.ndarray:
    """Global 2-D drift between two frames: the shift to add to the second image to get
    the first (reference ``basic_image_manipulations.py:522-536``)."""
    factor = 100 if sub_pixel_precision else 1
    return phase_cross_correlation(first_image, second_image, upsample_factor=factor)
