"""Fused projection kernels (projection/fused.py) vs the reference-path projection.

Runs the Pallas kernels in interpret mode on CPU; tolerance class = fast mode
(decimated score): z-maps within 1 plane on >=99% of pixels, projections close
wherever the z-maps agree.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tissue_image_processing_tpu.projection.fused import (
    fused_projection, fused_projection_supported)
from tissue_image_processing_tpu.projection.surface import (
    time_point_surface_projection)


def make_stack(C=2, Z=8, Y=128, X=128, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:Y, 0:X].astype(np.float32)
    depth = Z / 2 + (Z / 4) * np.sin(yy / 37.0) * np.cos(xx / 53.0)
    zz = np.arange(Z, dtype=np.float32).reshape(Z, 1, 1)
    zprof = np.exp(-((zz - depth) ** 2) / 2.0)
    img = np.empty((C, Z, Y, X), np.float32)
    for c in range(C):
        tex = rng.random((Y, X)).astype(np.float32) * 0.5 + 0.5
        img[c] = zprof * tex[None] * 40000 + rng.normal(0, 150, (Z, Y, X))
    return np.clip(img, 0, 65535).astype(np.uint16)


def test_fused_projection_supported_gate():
    assert fused_projection_supported((2, 8, 128, 128))
    assert not fused_projection_supported((2, 8, 100, 128))   # Y % 64
    assert not fused_projection_supported((2, 8, 128, 96))    # X % 128
    assert not fused_projection_supported((2, 8, 64, 128))    # Y >= 2 blocks


def test_fused_projection_matches_fast_path():
    stack = make_stack()
    with pltpu.force_tpu_interpret_mode():
        proj_f, z_f = fused_projection(jnp.asarray(stack), reference_channel=0,
                                       airyscan=False)
    proj_r, z_r = time_point_surface_projection(
        jnp.asarray(stack.astype(np.float32)), reference_channel=0, airyscan=False)
    proj_f, z_f = np.asarray(proj_f), np.asarray(z_f)
    proj_r, z_r = np.asarray(proj_r), np.asarray(z_r)
    dz = np.abs(z_f - z_r)
    assert (dz <= 1).mean() > 0.99, f"z-map diverges: frac(dz<=1)={(dz<=1).mean():.4f}"
    same = (dz == 0)
    rel = np.abs(proj_f[:, same] - proj_r[:, same]) / (np.abs(proj_r[:, same]) + 1.0)
    assert np.median(rel) < 0.02, f"projection rel err median {np.median(rel):.4f}"


def test_fused_projection_airyscan_and_shift():
    stack = make_stack(seed=3).astype(np.float32) + 10000.0
    stack = np.clip(stack, 0, 65535).astype(np.uint16)
    with pltpu.force_tpu_interpret_mode():
        proj_a, z_a = fused_projection(jnp.asarray(stack), airyscan=True)
        proj_s, z_s = fused_projection(jnp.asarray(stack), airyscan=True,
                                       atoh_shift=1)
    assert np.asarray(z_a).shape == (128, 128)
    # the reference channel is unchanged by atoh_shift; the other channel moves
    np.testing.assert_allclose(np.asarray(proj_s)[0], np.asarray(proj_a)[0],
                               rtol=1e-5)
    assert not np.allclose(np.asarray(proj_s)[1], np.asarray(proj_a)[1])
