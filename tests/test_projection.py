import os

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage as ndi

from tissue_image_processing_tpu.projection.surface import (
    time_point_surface_projection, build_continuous_manifold)
from tissue_image_processing_tpu.projection.driver import project_movie_array
from tissue_image_processing_tpu.io.tiff import save_tiff, read_tiff, to_tczyx


def synthetic_stack(C=2, Z=12, Y=48, X=48, seed=0):
    """Membrane sheet at a smooth, spatially varying depth."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:Y, 0:X]
    depth = 4 + 3 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
    stack = np.zeros((C, Z, Y, X), np.float32)
    for z in range(Z):
        w = np.exp(-((z - depth) ** 2) / 2.0)
        for c in range(C):
            stack[c, z] = w * (4000 + 2000 * r.random((Y, X))) + 100 * r.random((Y, X))
    return stack, depth


def reference_projection_oracle(stack, reference_channel=0, airyscan=False):
    """Numpy port of the reference time_point_surface_projection
    (surface_projection.py:17-85), bin_size=1, argmax height map."""
    image = stack.astype(np.float32).copy()
    if airyscan:
        image -= 10000
        image[image < 0] = 0
    proj = image[reference_channel].copy()
    nz = proj[proj > 0]
    if nz.size:
        p95 = np.percentile(nz, 95)
        proj[proj > p95] = p95
    proj = ndi.gaussian_filter(proj, (0.5, 1, 1), mode="nearest")
    score = ndi.gaussian_filter(proj, (0.5, 30, 30), mode="nearest")
    chosen_z = np.argmax(score, axis=0)
    z, y, x = image.shape[1:]
    mask = np.zeros((z, y * x), np.float32)
    mask[chosen_z.ravel(), np.arange(y * x)] = 1
    mask = ndi.gaussian_filter(mask.reshape(z, y, x), (1, 2, 2), mode="nearest")
    out = np.stack([np.max(image[c] * mask, axis=0) for c in range(image.shape[0])])
    return out, chosen_z


def test_projection_matches_reference_oracle():
    stack, depth = synthetic_stack()
    got_proj, got_z = time_point_surface_projection(
        jnp.asarray(stack), reference_channel=0, airyscan=False, precise=True)
    want_proj, want_z = reference_projection_oracle(stack)
    np.testing.assert_array_equal(np.asarray(got_z), want_z)
    np.testing.assert_allclose(np.asarray(got_proj), want_proj, rtol=1e-4, atol=0.5)


def test_projection_fast_mode_close_to_exact():
    # default (fast) scoring approximates the sigma=30 Gaussian with a box cascade;
    # the height map may flip by at most one plane on near-ties
    stack, depth = synthetic_stack()
    fast_proj, fast_z = time_point_surface_projection(
        jnp.asarray(stack), reference_channel=0, airyscan=False)
    want_proj, want_z = reference_projection_oracle(stack)
    dz = np.abs(np.asarray(fast_z) - want_z)
    assert dz.max() <= 1
    rel = np.abs(np.asarray(fast_proj) - want_proj) / (np.abs(want_proj) + 1.0)
    assert np.median(rel) < 0.01


def test_projection_height_map_tracks_depth():
    stack, depth = synthetic_stack()
    _, got_z = time_point_surface_projection(jnp.asarray(stack), reference_channel=0,
                                             airyscan=False)
    err = np.abs(np.asarray(got_z) - depth)
    assert np.median(err) < 1.5


def test_projection_airyscan_offset():
    stack, _ = synthetic_stack()
    shifted = stack + 10000.0
    a, za = time_point_surface_projection(jnp.asarray(shifted), reference_channel=0,
                                          airyscan=True)
    b, zb = time_point_surface_projection(jnp.asarray(stack), reference_channel=0,
                                          airyscan=False)
    np.testing.assert_array_equal(np.asarray(za), np.asarray(zb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1.0)


def test_projection_z_window():
    stack, _ = synthetic_stack()
    proj, z = time_point_surface_projection(jnp.asarray(stack), reference_channel=0,
                                            airyscan=False, min_z=2, max_z=10)
    assert 2 <= int(np.asarray(z).min()) and int(np.asarray(z).max()) < 10


def test_manifold_continuity():
    stack, depth = synthetic_stack()
    proj = ndi.gaussian_filter(stack[0], (0.5, 1, 1), mode="nearest")
    score = ndi.gaussian_filter(proj, (0.5, 30, 30), mode="nearest")
    # corrupt a corner of the score to create an outlier argmax the manifold must fix
    score[-1, :8, :8] = score.max() * 10
    z = np.asarray(build_continuous_manifold(jnp.asarray(score)))
    # continuity: 4-neighbor plane differences bounded
    assert np.abs(np.diff(z, axis=0)).max() <= 2
    assert np.abs(np.diff(z, axis=1)).max() <= 2


def test_project_movie_array_batching():
    stack, _ = synthetic_stack()
    movie = np.stack([stack, stack * 1.1, stack * 0.9], axis=0)
    proj, zmap = project_movie_array(movie, reference_channel=0, batch=2)
    assert proj.shape == (3, 2, 48, 48)
    assert zmap.shape == (3, 48, 48)
    single, sz = time_point_surface_projection(jnp.asarray(stack), reference_channel=0,
                                               airyscan=False)
    np.testing.assert_allclose(proj[0], np.asarray(single), rtol=1e-4, atol=0.5)


def test_tiff_roundtrip(tmp_path):
    arr = (np.random.default_rng(0).random((3, 2, 8, 16)) * 65535).astype(np.uint16)
    p = os.path.join(tmp_path, "x.tif")
    save_tiff(p, arr, axes="TCYX")
    back, axes, shape, meta = read_tiff(p)
    assert axes == "TCYX"
    np.testing.assert_array_equal(back, arr)


def test_update_projection_metadata(tmp_path):
    """SizeT + physical pixel sizes rewrite into a saved projection TIFF
    (reference update_projection_metadata, surface_projection.py:319-327)."""
    from tissue_image_processing_tpu.projection.driver import (
        update_projection_metadata)

    arr = (np.random.default_rng(1).random((3, 2, 8, 16)) * 65535).astype(np.uint16)
    p = os.path.join(tmp_path, "proj.tif")
    save_tiff(p, arr, axes="TCYX")
    update_projection_metadata(p, size_t=3, physical_pixel_sizes=(1.0, 0.1, 0.1))
    back, axes, _, meta = read_tiff(p)
    assert axes == "TCYX"
    np.testing.assert_array_equal(back, arr)
    assert meta["SizeT"] == 3
    assert meta["physical_size_y"] == 0.1 and meta["physical_size_z"] == 1.0


def test_tiff_rescale_uint16(tmp_path):
    arr = np.random.default_rng(0).random((4, 8)).astype(np.float32)
    p = os.path.join(tmp_path, "y.tif")
    save_tiff(p, arr, axes="YX", data_type="uint16")
    back, _, _, _ = read_tiff(p)
    assert back.dtype == np.uint16
    assert back.max() == 65535


def test_to_tczyx():
    arr = np.zeros((5, 4, 3))  # TYX
    out = to_tczyx(arr, "TYX")
    assert out.shape == (5, 1, 1, 4, 3)
    arr = np.zeros((2, 5, 3, 4))  # CTYX -> transpose
    out = to_tczyx(arr, "CTYX")
    assert out.shape == (5, 2, 1, 3, 4)


def test_cli_smoke(tmp_path):
    from tissue_image_processing_tpu.projection.cli import main
    stack, _ = synthetic_stack(Z=6, Y=24, X=24)
    movie = np.stack([stack, stack], axis=0)  # T=2
    np.save(os.path.join(tmp_path, "m1.npy"), movie)
    rc = main(["-i", str(tmp_path), "-n", "1", "-m", "1", "-r", "0", "--ext", "npy"])
    assert rc == 0
    out = os.path.join(tmp_path, "position1.tif")
    assert os.path.exists(out)
    img, axes, shape, _ = read_tiff(out)
    assert axes == "TCYX" and shape[0] == 2
    assert os.path.exists(os.path.join(tmp_path, "zmap_position1.npy"))


def test_projection_fast_decimated_path_close_to_exact():
    # at >=512^2 the fast score blur decimates 4x; z-map may differ by <=1 plane
    stack, _ = synthetic_stack(C=1, Z=8, Y=512, X=512, seed=3)
    fast_proj, fast_z = time_point_surface_projection(
        jnp.asarray(stack), reference_channel=0, airyscan=False)
    want_proj, want_z = reference_projection_oracle(stack)
    dz = np.abs(np.asarray(fast_z) - want_z)
    assert np.mean(dz <= 1) > 0.995, (dz.max(), np.mean(dz <= 1))
    rel = np.abs(np.asarray(fast_proj) - want_proj) / (np.abs(want_proj) + 1.0)
    assert np.median(rel) < 0.02
