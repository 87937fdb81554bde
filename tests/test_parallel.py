"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest sets it up).

Covers SURVEY §5.8: the (data x model) U-Net training mesh and the ("frame",)
image-pipeline mesh, including parity of the sharded pipeline against the
unsharded single-device program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tissue_image_processing_tpu.parallel.mesh import make_mesh
from tissue_image_processing_tpu.parallel.pipeline import (
    make_frame_mesh, sharded_movie_pipeline)


def test_make_mesh_validates_device_count():
    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(1024)
    with pytest.raises(ValueError):
        make_frame_mesh(1024)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    mesh = make_mesh(2)
    assert dict(mesh.shape) == {"data": 1, "model": 2}
    fmesh = make_frame_mesh(8)
    assert dict(fmesh.shape) == {"frame": 8}


def _tiny_movie(T, C=2, Z=4, H=64, W=64, seed=0):
    rng = np.random.default_rng(seed)
    zz = np.arange(Z, dtype=np.float32).reshape(Z, 1, 1)
    depth = Z / 2.0
    zprof = np.exp(-((zz - depth) ** 2) / 2.0)
    base = rng.random((T, C, 1, H, W)).astype(np.float32) * 1000.0
    return jnp.asarray(base * zprof[None, None])


def test_sharded_pipeline_matches_single_device():
    """The frame-sharded program must produce the same tracks as the plain
    single-device chain (same ops, so exact equality is expected)."""
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    from tissue_image_processing_tpu.core.tracking import (
        compute_drift_chain, track_movie)
    from tissue_image_processing_tpu.ops.watershed import watershed_segmentation
    from tissue_image_processing_tpu.projection.surface import (
        time_point_surface_projection)

    T, cap = 8, 64
    movie = _tiny_movie(T)
    mesh = make_frame_mesh(8)
    pipe = sharded_movie_pipeline(mesh, capacity=cap, block_size=31)
    ids_sharded = np.asarray(pipe(movie))

    def one_frame(stack):
        stack = stack.astype(jnp.float32)
        proj, _ = time_point_surface_projection(
            stack, reference_channel=0, airyscan=False)
        labels = watershed_segmentation(proj[0], 0.2, 3.0, 31)
        table = frame_cellinfo(labels, capacity=cap)
        return proj[0], table.cy, table.cx, table.area, table.valid_mask()

    projs, cy, cx, area, mask = jax.lax.map(one_frame, movie)
    drifts = compute_drift_chain(projs)
    ids_single = np.asarray(track_movie(cy, cx, area, mask, drifts=drifts,
                                        capacity=2 * cap))
    assert ids_sharded.shape == ids_single.shape == (T, cap)
    assert (ids_sharded > 0).sum() > 0
    np.testing.assert_array_equal(ids_sharded, ids_single)


def test_sharded_pipeline_uneven_frames_per_device():
    """2 frames per device also works (lax.map over the local shard)."""
    mesh = make_frame_mesh(4)
    movie = _tiny_movie(8)
    pipe = sharded_movie_pipeline(mesh, capacity=64, block_size=31)
    ids = np.asarray(pipe(movie))
    assert ids.shape == (8, 64)


def test_sharded_unet_pipeline_matches_single_device():
    """VERDICT r2 item 6: the U-Net variant (proj -> UNet -> postprocess ->
    track) sharded over the frame mesh matches the single-device chain exactly
    (weights replicated, per-frame tensors frame-sharded).

    Frames are deliberately NON-square and NON-pow2 (48 x 40): the pipeline
    must mirror SegmentationPredictor.prepare_image — x-major transpose +
    front-pad to the next power of two — or the up-path skip concatenations
    fail at trace time and trained weights would see transposed images."""
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    from tissue_image_processing_tpu.core.tracking import (
        compute_drift_chain, track_movie)
    from tissue_image_processing_tpu.models.predictor import (
        find_desired_shape, unet_postprocess)
    from tissue_image_processing_tpu.models.unet import build_unet
    from tissue_image_processing_tpu.ops.brightness import normalize_channel
    from tissue_image_processing_tpu.parallel.pipeline import (
        sharded_unet_pipeline)
    from tissue_image_processing_tpu.projection.surface import (
        time_point_surface_projection)

    T, cap, H, W = 8, 64, 48, 40
    movie = _tiny_movie(T, H=H, W=W)
    model, variables = build_unet(find_desired_shape(W, H) + (2,),
                                  depth=2, base_filters=8)
    mesh = make_frame_mesh(8)
    pipe = sharded_unet_pipeline(mesh, model, capacity=cap)
    ids_sharded = np.asarray(pipe(variables, movie))

    def one_frame(stack):
        stack = stack.astype(jnp.float32)
        proj, _ = time_point_surface_projection(
            stack, reference_channel=0, airyscan=False)
        norm = jax.vmap(normalize_channel)(proj)
        x_major = jnp.transpose(norm)                  # (X, Y, C)
        px, py = find_desired_shape(W, H)
        padded = jnp.pad(x_major, ((px - W, 0), (py - H, 0), (0, 0)))
        pred = model.apply(variables, padded[None], train=False)[0]
        pred = pred[px - W:, py - H:, :]
        labels, _hc = unet_postprocess(pred.astype(jnp.float32))
        table = frame_cellinfo(labels.T, capacity=cap)  # back to (Y, X)
        return proj[0], table.cy, table.cx, table.area, table.valid_mask()

    projs, cy, cx, area, mask = jax.lax.map(one_frame, movie)
    drifts = compute_drift_chain(projs)
    ids_single = np.asarray(track_movie(cy, cx, area, mask, drifts=drifts,
                                        capacity=2 * cap))
    assert ids_sharded.shape == ids_single.shape == (T, cap)
    np.testing.assert_array_equal(ids_sharded, ids_single)


@pytest.mark.parametrize("chunk", [8, 16, 24])
def test_sharded_chunked_matches_unchunked(chunk):
    """Streaming composes with sharding: T-chunks through the frame mesh with
    tracking-state / boundary-drift carry reproduce the whole-movie sharded
    run's ids exactly — multi-chip >HBM streaming (SURVEY 5.8), including a
    padded tail chunk (T=20 with chunk=8 or 16) and chunk == T."""
    from tissue_image_processing_tpu.parallel.pipeline import (
        sharded_movie_pipeline_chunked)

    T = 24 if chunk == 24 else 20
    movie = _tiny_movie(T)
    mesh = make_frame_mesh(8)
    want = np.asarray(sharded_movie_pipeline(mesh, capacity=64,
                                             block_size=31)(movie[:T - T % 8]
                                                            if T % 8 else movie))
    got = sharded_movie_pipeline_chunked(mesh, np.asarray(movie),
                                         chunk_frames=chunk, capacity=64,
                                         block_size=31)
    assert got.shape == (T, 64)
    # compare on the frames the unchunked mesh run covers (T divisible by 8)
    T8 = want.shape[0]
    np.testing.assert_array_equal(got[:T8], want)


def test_sharded_chunked_on_chunk_streams():
    from tissue_image_processing_tpu.parallel.pipeline import (
        sharded_movie_pipeline_chunked)

    movie = _tiny_movie(16)
    mesh = make_frame_mesh(8)
    seen = []
    got = sharded_movie_pipeline_chunked(
        mesh, np.asarray(movie), chunk_frames=8, capacity=64, block_size=31,
        on_chunk=lambda t0, ids: seen.append((t0, ids.shape[0])))
    assert seen == [(0, 8), (8, 8)]
    assert got.shape == (16, 64)


def test_sharded_chunked_rejects_bad_chunk():
    from tissue_image_processing_tpu.parallel.pipeline import (
        sharded_movie_pipeline_chunked)

    mesh = make_frame_mesh(8)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        sharded_movie_pipeline_chunked(mesh, np.zeros((16, 1, 2, 16, 16)),
                                       chunk_frames=12)
