"""Brightness / contrast normalization ops.

TPU-native equivalents of the reference's channel normalizers
(``basic_image_manipulations.py:233-369`` — ``set_brightness``,
``set_channel_brightness``, ``binary_image`` and skimage's ``adjust_gamma``).
All are pure jittable array->array functions over channel-first data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tissue_image_processing_tpu.ops.percentile import percentile

__all__ = ["adjust_gamma", "set_channel_brightness", "set_brightness", "binary_image",
           "normalize_channel"]


def adjust_gamma(image: jnp.ndarray, gamma: float = 1.0, gain: float = 1.0) -> jnp.ndarray:
    """skimage.exposure.adjust_gamma semantics for float images in [0, 1]."""
    return gain * jnp.power(image, gamma)


@functools.partial(jax.jit, static_argnames=("method", "clear_extreme_percentage"))
def set_channel_brightness(
    image: jnp.ndarray,
    max_possible_val: float,
    method: str = "bestFit",
    clear_extreme_percentage: float = 1.0,
    minimum_pixel_val: float = 0.0,
) -> jnp.ndarray:
    """Per-channel brightness normalization matching the reference
    (``basic_image_manipulations.py:303-348``):

    1. clip the top ``clear_extreme_percentage`` percentile;
    2. shift by the bottom percentile (or ``minimum_pixel_val`` if larger);
    3. scale to max 1, add 1/max_possible_val, clamp negatives at 0;
    4. 'bestFit' additionally applies gamma (reference uses the default gamma=1).
    """
    img = image.astype(jnp.float32)
    if clear_extreme_percentage > 0:
        new_max = percentile(img, 100.0 - clear_extreme_percentage)
        new_min = percentile(img, clear_extreme_percentage)
        new_min = jnp.where(minimum_pixel_val > 0,
                            jnp.maximum(new_min, minimum_pixel_val), new_min)
        img = jnp.minimum(img, new_max)
    else:
        new_min = jnp.asarray(minimum_pixel_val, jnp.float32)
    if method in ("minMax", "bestFit"):
        img = img - new_min
        img = img / jnp.max(img)
        img = img + 1.0 / max_possible_val
        img = jnp.maximum(img, 0.0)
    if method == "bestFit":
        img = adjust_gamma(img)
    return img


def set_brightness(
    image: jnp.ndarray,
    channel_axis: int = 0,
    method: str = "bestFit",
    clear_extreme_percentage: float = 1.0,
    min_val: float = 0.0,
    max_val: float = 0.0,
) -> jnp.ndarray:
    """Normalize each channel of an image/movie to floats in [0, 1]
    (reference ``set_brightness``, ``basic_image_manipulations.py:233-301``).

    ``channel_axis < 0`` means no channel axis (single-channel data).
    """
    dt = image.dtype
    if max_val:
        max_possible = float(max_val)
    else:
        max_possible = 255.0 if dt == jnp.uint8 else 65535.0 if dt == jnp.uint16 else 1.0
    if channel_axis < 0:
        return set_channel_brightness(image, max_possible, method,
                                      clear_extreme_percentage, max(min_val, 0.0))
    moved = jnp.moveaxis(image, channel_axis, 0)
    fn = lambda ch: set_channel_brightness(ch, max_possible, method,
                                           clear_extreme_percentage, max(min_val, 0.0))
    out = jax.vmap(fn)(moved)
    return jnp.moveaxis(out, 0, channel_axis)


def binary_image(image: jnp.ndarray, thresholds, channel_axis: int = -1) -> jnp.ndarray:
    """Per-channel binarization (reference ``basic_image_manipulations.py:350-369``):
    pixels above the channel threshold -> 1, below -> 0 (pixels exactly at the
    threshold keep their value in the reference; we match that)."""
    img = image.astype(jnp.float32)
    if channel_axis < 0:
        thr = jnp.asarray(thresholds, jnp.float32).reshape(())
        return jnp.where(img > thr, 1.0, jnp.where(img < thr, 0.0, img))
    thr = jnp.asarray(thresholds, jnp.float32)
    if thr.ndim == 0:
        thr = jnp.full((image.shape[channel_axis],), thr)
    shape = [1] * image.ndim
    shape[channel_axis] = image.shape[channel_axis]
    thr = thr.reshape(shape)
    return jnp.where(img > thr, 1.0, jnp.where(img < thr, 0.0, img))


def normalize_channel(image: jnp.ndarray) -> jnp.ndarray:
    """1-99 percentile clip + rescale, matching the U-Net predictor's per-channel
    normalization (reference ``Segmentation/prediction_local.py:21-29``)."""
    img = image.astype(jnp.float32)
    p99 = percentile(img, 99.0)
    p1 = percentile(img, 1.0)
    img = jnp.clip(img, p1, p99)
    return (img - p1) / (p99 - p1)
