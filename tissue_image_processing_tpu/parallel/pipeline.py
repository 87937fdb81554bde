"""Frame-sharded image pipeline: proj -> seg -> cellinfo -> drift -> track.

The reference is single-device (SURVEY.md §2.9/§5.8); this is the TPU scale-out:
the heavy per-frame pixel work (surface projection, watershed, regionprops) is
embarrassingly parallel over the movie's T axis, so it runs under ``shard_map``
over a 1-D ``("frame",)`` mesh with zero collectives. Only two small cross-frame
exchanges ride ICI:

- drift needs each shard's *previous* frame: one ``ppermute`` sends each device's
  last projected frame to its right neighbor (frame halo of 1);
- tracking is a sequential scan over T on O(capacity) tables: the per-frame
  tables and drifts are ``all_gather``-ed (tiled) and the scan runs replicated —
  the tables are ~KBs/frame, 3 orders of magnitude smaller than the pixel data.

The ``frame`` axis can span hosts over DCN without API change.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_frame_mesh", "sharded_movie_pipeline",
           "sharded_unet_pipeline", "sharded_movie_pipeline_chunked"]


def make_frame_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh with a single ``frame`` axis over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested {n} devices but only {len(devices)} are visible "
            f"({jax.default_backend()} backend); for a virtual CPU mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"JAX_PLATFORMS=cpu before importing jax")
    return Mesh(np.array(devices[:n]), ("frame",))


def sharded_movie_pipeline(
    mesh: Mesh,
    capacity: int = 256,
    track_capacity: Optional[int] = None,
    reference_channel: int = 0,
    threshold: float = 0.2,
    std: float = 3.0,
    block_size: int = 101,
    airyscan: bool = False,
    upsample_factor: int = 100,
):
    """Build a jitted ``fn(movie) -> (T, capacity) track ids`` with the per-frame
    work sharded over the mesh's ``frame`` axis.

    ``movie``: (T, C, Z, H, W), T divisible by the mesh size. Mirrors the bench /
    reference end-to-end path (``surface_projection.py:17-85`` ->
    ``basic_image_manipulations.py:446-476`` -> ``tissue_info.py:880-909`` ->
    ``tissue_info.py:1881-1933``).
    """
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    from tissue_image_processing_tpu.core.tracking import track_movie
    from tissue_image_processing_tpu.ops.drift import phase_cross_correlation
    from tissue_image_processing_tpu.ops.watershed import watershed_segmentation
    from tissue_image_processing_tpu.projection.surface import (
        time_point_surface_projection)

    n = mesh.shape["frame"]
    track_cap = track_capacity or 2 * capacity

    def one_frame(stack):
        stack = stack.astype(jnp.float32)
        proj, _ = time_point_surface_projection(
            stack, reference_channel=reference_channel, airyscan=airyscan)
        ref = proj[reference_channel]
        labels = watershed_segmentation(ref, threshold, std, block_size)
        # tracking consumes positions/areas only; skip the adjacency scatter
        table = frame_cellinfo(labels, capacity=capacity, with_neighbors=False)
        return ref, table.cy, table.cx, table.area, table.valid_mask()

    def shard_fn(movie_shard):  # (T/n, C, Z, H, W) on each device
        ref, cy, cx, area, mask = jax.lax.map(one_frame, movie_shard)
        return _drift_track_tail(ref, cy, cx, area, mask, n=n,
                                 upsample_factor=upsample_factor,
                                 track_cap=track_cap)

    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=P("frame"), out_specs=P(),
                       check_vma=False)
    return jax.jit(fn)


def _drift_track_tail(ref, cy, cx, area, mask, n, upsample_factor, track_cap):
    """Shared pipeline tail inside shard_map: ppermute frame halo for drift,
    all_gather the O(capacity) tables, replicated tracking scan."""
    from tissue_image_processing_tpu.core.tracking import track_movie
    from tissue_image_processing_tpu.ops.drift import phase_cross_correlation

    # frame halo of 1: previous device's last projection, over ICI
    prev_last = jax.lax.ppermute(
        ref[-1], "frame", [(i, (i + 1) % n) for i in range(n)])
    prev = jnp.concatenate([prev_last[None], ref[:-1]], axis=0)
    f = functools.partial(phase_cross_correlation,
                          upsample_factor=upsample_factor)
    shifts = jax.vmap(f)(prev, ref)  # (T/n, 2)
    gather = lambda x: jax.lax.all_gather(x, "frame", tiled=True)
    cy_a, cx_a, area_a, mask_a, drifts = map(
        gather, (cy, cx, area, mask, shifts))
    # global frame 0 has no predecessor (its ppermute input wrapped around)
    drifts = drifts.at[0].set(0.0)
    return track_movie(cy_a, cx_a, area_a, mask_a, drifts=drifts,
                       capacity=track_cap)


def _sharded_segment_program(mesh, capacity, reference_channel, threshold,
                             std, block_size, airyscan, upsample_factor):
    """Frame-sharded segment stage for the CHUNKED multi-chip driver:
    ``fn(chunk, prev_ref) -> (cy, cx, area, mask, drifts, last_ref)``.

    Identical per-frame work to :func:`sharded_movie_pipeline`, but the
    tracking tail stays outside so scan state can carry across chunks;
    ``prev_ref`` (replicated) is the previous chunk's last projected frame —
    the global-frame-0 shard takes it as its drift predecessor instead of the
    ppermute wrap-around, so drift[0] of each chunk is the true boundary
    shift (the same carry the single-chip ``movie_pipeline_chunked`` makes)."""
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    from tissue_image_processing_tpu.ops.drift import phase_cross_correlation
    from tissue_image_processing_tpu.ops.watershed import watershed_segmentation
    from tissue_image_processing_tpu.projection.surface import (
        time_point_surface_projection)

    n = mesh.shape["frame"]

    def one_frame(stack):
        stack = stack.astype(jnp.float32)
        proj, _ = time_point_surface_projection(
            stack, reference_channel=reference_channel, airyscan=airyscan)
        ref = proj[reference_channel]
        labels = watershed_segmentation(ref, threshold, std, block_size)
        table = frame_cellinfo(labels, capacity=capacity, with_neighbors=False)
        return ref, table.cy, table.cx, table.area, table.valid_mask()

    def shard_fn(movie_shard, prev_ref):
        ref, cy, cx, area, mask = jax.lax.map(one_frame, movie_shard)
        prev_last = jax.lax.ppermute(
            ref[-1], "frame", [(i, (i + 1) % n) for i in range(n)])
        idx = jax.lax.axis_index("frame")
        first_prev = jnp.where(idx == 0, prev_ref, prev_last)
        prev = jnp.concatenate([first_prev[None], ref[:-1]], axis=0)
        f = functools.partial(phase_cross_correlation,
                              upsample_factor=upsample_factor)
        shifts = jax.vmap(f)(prev, ref)
        gather = lambda x: jax.lax.all_gather(x, "frame", tiled=True)
        cy_a, cx_a, area_a, mask_a, drifts = map(
            gather, (cy, cx, area, mask, shifts))
        # broadcast the chunk's (globally) last projected frame to every
        # device for the next chunk's boundary drift: only the last shard
        # contributes, so the psum is an exact one-to-all broadcast
        last = jax.lax.psum(
            jnp.where(idx == n - 1, ref[-1], jnp.zeros_like(ref[-1])),
            "frame")
        return cy_a, cx_a, area_a, mask_a, drifts, last

    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=(P("frame"), P()),
                       out_specs=P(), check_vma=False)
    return jax.jit(fn)


def sharded_movie_pipeline_chunked(
    mesh: Mesh,
    store,
    chunk_frames: int,
    capacity: int = 256,
    track_capacity: Optional[int] = None,
    reference_channel: int = 0,
    threshold: float = 0.2,
    std: float = 3.0,
    block_size: int = 101,
    airyscan: bool = False,
    upsample_factor: int = 100,
    on_chunk=None,
):
    """Streaming multi-chip pipeline: >HBM movies in T-chunks over the frame
    mesh (SURVEY §5.8: the frame axis spans hosts "without API change").

    Each ``chunk_frames``-sized T-chunk (a multiple of the mesh's frame axis)
    runs the frame-sharded proj -> watershed -> cellinfo -> drift program;
    across chunks the tracker's scan state, cumulative drift and the boundary
    reference frame carry exactly as in the single-chip
    :func:`~tissue_image_processing_tpu.core.pipeline.movie_pipeline_chunked`,
    so chunked+sharded ids == the unchunked :func:`sharded_movie_pipeline`'s.
    The tail chunk pads by repeating the last frame and masks it out with
    ``frame_valid`` (constant program shape). ``on_chunk(t0, ids)`` receives
    each chunk's real-frame ids for persistence. Returns (T, capacity) ids.
    """
    from tissue_image_processing_tpu.core.tracking import (TrackingState,
                                                           track_movie)

    n = mesh.shape["frame"]
    data = store.data if hasattr(store, "data") else store
    if data.ndim != 5:
        raise ValueError(f"movie must be (T, C, Z, Y, X), got {data.shape}")
    T = data.shape[0]
    C = max(1, min(int(chunk_frames), T))
    if C % n:
        raise ValueError(
            f"chunk_frames {C} must be a multiple of the mesh's frame axis {n}")
    track_cap = track_capacity or 2 * capacity
    seg = _sharded_segment_program(mesh, capacity, reference_channel,
                                   threshold, std, block_size, airyscan,
                                   upsample_factor)
    state = TrackingState.empty(track_cap)
    cum = jnp.zeros((2,), jnp.float32)
    prev_ref = jnp.zeros((data.shape[3], data.shape[4]), jnp.float32)
    ids_chunks = []
    for ci, t0 in enumerate(range(0, T, C)):
        real = min(C, T - t0)
        chunk = np.asarray(data[t0:t0 + real])
        if real < C:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], C - real, axis=0)], axis=0)
        with mesh:
            cy, cx, area, mask, drifts, last_ref = seg(jnp.asarray(chunk),
                                                       prev_ref)
        if ci == 0:
            drifts = drifts.at[0].set(0.0)  # frame 0 has no predecessor
        valid = np.zeros((C,), bool)
        valid[:real] = True
        mask = mask & jnp.asarray(valid)[:, None]
        ids, state, cum = track_movie(
            cy, cx, area, mask, drifts=drifts,
            frame_valid=jnp.asarray(valid), capacity=track_cap,
            init_state=state, cum_drift_init=cum, return_state=True)
        prev_ref = last_ref
        ids_np = np.asarray(ids)[:real]
        if on_chunk is not None:
            on_chunk(t0, ids_np)
        ids_chunks.append(ids_np)
    return np.concatenate(ids_chunks, axis=0)


def sharded_unet_pipeline(
    mesh: Mesh,
    model,
    capacity: int = 256,
    track_capacity: Optional[int] = None,
    reference_channel: int = 0,
    airyscan: bool = False,
    upsample_factor: int = 100,
):
    """The ML-segmentation variant of :func:`sharded_movie_pipeline`:
    proj -> normalize -> U-Net -> postprocess -> cellinfo -> drift -> track,
    frame-sharded (VERDICT r2 item 6 / SURVEY §5.8 mesh plan).

    Returns a jitted ``fn(variables, movie) -> (T, capacity) track ids``.
    U-Net weights are REPLICATED (in_specs P() — they are ~100 MB bf16, far
    smaller than the sharded pixel data; model-parallel sharding of the convs
    belongs to training, ``parallel/mesh.py``) while every per-frame tensor is
    sharded over ``frame``. Mirrors the reference's prediction path
    (``prediction_local.py:124-199`` -> ``tissue_info.py:880-909``).
    """
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    from tissue_image_processing_tpu.models.predictor import unet_postprocess
    from tissue_image_processing_tpu.ops.brightness import normalize_channel
    from tissue_image_processing_tpu.projection.surface import (
        time_point_surface_projection)

    n = mesh.shape["frame"]
    track_cap = track_capacity or 2 * capacity

    from tissue_image_processing_tpu.models.predictor import find_desired_shape

    def one_frame(variables, stack):
        stack = stack.astype(jnp.float32)
        proj, _ = time_point_surface_projection(
            stack, reference_channel=reference_channel, airyscan=airyscan)
        norm = jax.vmap(normalize_channel)(proj)       # (C, Y, X) in [0, 1]
        # mirror SegmentationPredictor.prepare_image exactly: the net is
        # trained/imported on x-major inputs and pow2 spatial sizes
        # (reference prediction_local.py:90-122) — feeding it the raw y-major
        # frame would transpose the image under trained weights, and non-pow2
        # sizes break the up-path skip concatenations
        x_major = jnp.transpose(norm)                  # (X, Y, C)
        sx, sy = x_major.shape[0], x_major.shape[1]
        px, py = find_desired_shape(sx, sy)
        padded = jnp.pad(x_major, ((px - sx, 0), (py - sy, 0), (0, 0)))
        pred = model.apply(variables, padded[None], train=False)[0]
        pred = pred[px - sx:, py - sy:, :]
        labels, _hc = unet_postprocess(pred.astype(jnp.float32))
        # back to (Y, X) so centroids pair with the (dy, dx) drift tail and
        # the output space matches sharded_movie_pipeline's watershed tables
        labels = labels.T
        # tracking consumes positions/areas only; skip the adjacency scatter
        table = frame_cellinfo(labels, capacity=capacity, with_neighbors=False)
        return (proj[reference_channel], table.cy, table.cx, table.area,
                table.valid_mask())

    def shard_fn(variables, movie_shard):
        ref, cy, cx, area, mask = jax.lax.map(
            functools.partial(one_frame, variables), movie_shard)
        return _drift_track_tail(ref, cy, cx, area, mask, n=n,
                                 upsample_factor=upsample_factor,
                                 track_cap=track_cap)

    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=(P(), P("frame")),
                       out_specs=P(), check_vma=False)
    return jax.jit(fn)
