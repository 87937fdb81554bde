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

__all__ = ["phase_cross_correlation", "calculate_drift", "refine_drift",
           "drift_chain_with_stage_priors"]


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


def refine_drift(previous: jnp.ndarray, current: jnp.ndarray,
                 coarse_dy: float = 0.0, coarse_dx: float = 0.0,
                 shape_quantum: int = 32):
    """Integer pre-shift crop to the overlap + sub-pixel phase-correlation
    refinement (reference ``calculate_refine_drift``/``update_drift``,
    ``tissue_info.py:1940-2035``).

    The coarse shift comes from host-side stage metadata, so the crop happens at
    trace time with Python ints (both crops floor the shift exactly like the
    reference). ``shape_quantum`` trims the overlap down to a multiple of 32 so
    a movie full of distinct stage jumps compiles only a handful of programs.

    Returns a host float array (total_dy, total_dx): rows then columns, the
    shift to add to ``current`` to align it with ``previous``.
    """
    import numpy as np

    ry = int(math.floor(float(coarse_dy)))
    rx = int(math.floor(float(coarse_dx)))
    H, W = previous.shape[-2:]
    oh = max(H - abs(ry), shape_quantum)
    ow = max(W - abs(rx), shape_quantum)
    oh -= oh % shape_quantum
    ow -= ow % shape_quantum
    a0 = ry if ry > 0 else 0
    b0 = -ry if ry < 0 else 0
    a1 = rx if rx > 0 else 0
    b1 = -rx if rx < 0 else 0
    prev_c = jax.lax.slice(jnp.asarray(previous), (a0, a1), (a0 + oh, a1 + ow))
    cur_c = jax.lax.slice(jnp.asarray(current), (b0, b1), (b0 + oh, b1 + ow))
    refined = np.asarray(phase_cross_correlation(prev_c, cur_c,
                                                 upsample_factor=100))
    return np.array([ry, rx], np.float64) + refined


def drift_chain_with_stage_priors(images, stage_shifts) -> "np.ndarray":
    """(T, H, W) images + (T, 2) per-frame coarse stage shifts (rows, cols;
    shift[0] ignored) -> (T, 2) refined drifts, drift[0] = 0 (reference
    ``update_drift`` with ``stage_locations``, ``tissue_info.py:1982-2035``).

    Host-orchestrated: each frame pair crops to the stage-predicted overlap and
    refines with sub-pixel phase correlation, so stage jumps far beyond the
    phase-correlation search envelope still register."""
    import numpy as np

    T = images.shape[0]
    drifts = np.zeros((T, 2), np.float64)
    for t in range(1, T):
        drifts[t] = refine_drift(images[t - 1], images[t],
                                 coarse_dy=float(stage_shifts[t, 0]),
                                 coarse_dx=float(stage_shifts[t, 1]))
    return drifts
