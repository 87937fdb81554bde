"""Single-device fused whole-movie pipeline.

The reference runs the movie workflow as GUI-thread loops with a host
round-trip per frame (segment-all ``gui.py:1348-1376``, tracking
``gui.py:1590-1603``); the multi-chip analog here is
``parallel/pipeline.py``. This module is the single-chip product API for the
same end-to-end path — projection -> watershed segmentation -> cell tables ->
drift -> tracking — as ONE jitted device program over the whole movie
(frames flood in stacked Pallas batches, tables vmap into radix matmuls,
tracking is one auction scan), with a single host read at the end. It is the
path the BASELINE north star measures (bench.py), exposed to users via
``cli pipeline``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["movie_pipeline", "movie_pipeline_chunked"]


def _flood_batch(T: int, batch: int) -> int:
    b = max(1, min(batch, T))
    while T % b:
        b -= 1
    return b


@functools.partial(jax.jit, static_argnames=(
    "reference_channel", "threshold", "std", "block_size", "capacity",
    "batch", "airyscan", "project"))
def _segment_program(movie, prev_ref=None, reference_channel=0, threshold=0.2,
                     std=3.0, block_size=101, capacity=1024, batch=2,
                     airyscan=False, project=True):
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo_checked
    from tissue_image_processing_tpu.core.tracking import compute_drift_chain
    from tissue_image_processing_tpu.ops.watershed import (
        watershed_segmentation_batch)
    from tissue_image_processing_tpu.projection.surface import (
        project_timepoint_auto)

    T = movie.shape[0]

    def ref_of(stack):
        if project:
            proj, _ = project_timepoint_auto(
                stack, reference_channel=reference_channel, airyscan=airyscan)
            return proj[reference_channel]
        return stack[reference_channel, 0].astype(jnp.float32)

    refs = jax.lax.map(ref_of, movie)                       # (T, Y, X)
    refs_t = jnp.swapaxes(refs, 1, 2)                       # x-major space
    B = _flood_batch(T, batch)

    def seg_group(group):
        return watershed_segmentation_batch(group, threshold, std, block_size)

    labels = jax.lax.map(
        seg_group, refs_t.reshape(T // B, B, *refs_t.shape[1:]))
    labels = labels.reshape(T, *labels.shape[2:])
    # compacted adjacency votes: exact for <= 192 vote runs per label row
    # (any real segmentation; ops/neighbors.py docstring has the contract) —
    # the per-frame overflow flags ride the same program so the host driver
    # can recompute any flagged frame's table with the exact scatter
    tabs, overflow = jax.vmap(lambda l: frame_cellinfo_checked(
        l, capacity=capacity, neighbor_compact_k=192))(labels)
    if prev_ref is None:
        drifts = compute_drift_chain(refs_t)
    else:
        # T-chunked streaming: the previous chunk's last projected reference
        # frame rides in on device so drift[0] is the chunk-BOUNDARY shift —
        # the chunked drift chain concatenates to the whole-movie one exactly
        drifts = compute_drift_chain(
            jnp.concatenate([prev_ref[None], refs_t], axis=0))[1:]
    return labels, tabs, drifts, overflow, refs_t[-1]


@functools.partial(jax.jit, static_argnames=(
    "reference_channel", "capacity", "batch", "airyscan", "project",
    "quantized", "depth", "base_filters", "norm"))
def _segment_program_unet(movie, params, prev_ref=None, reference_channel=0,
                          capacity=1024, batch=8, airyscan=False, project=True,
                          quantized=False, depth=3, base_filters=128,
                          norm="shift"):
    """U-Net twin of :func:`_segment_program` — the one-device-program
    proj -> normalize -> U-Net forward -> morphology post-process -> tables ->
    drift path (the reference's GUI U-Net workflow, ``gui.py:1391-1407,
    2039-2079``, as a fused program instead of per-frame host round-trips).

    ``movie``: (T, C=2, Z, Y, X) with channels ordered (atoh, zo) — the model
    input order (``prediction_local.py:102-104``). Frames group into
    ``batch``-sized U-Net forwards (B=8 runs the convs at ~172 TF/s vs ~116
    at B=1 on v5e) and each group's boundary maps flood as ONE stacked Pallas
    launch. Labels come back in the reference's x-major (X, Y) space; drifts
    are measured on the y-major projection and column-swapped to match.
    """
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo_checked
    from tissue_image_processing_tpu.core.tracking import compute_drift_chain
    from tissue_image_processing_tpu.models.predictor import (
        find_desired_shape, unet_postprocess_batch)
    from tissue_image_processing_tpu.ops.brightness import normalize_channel
    from tissue_image_processing_tpu.projection.surface import (
        project_timepoint_auto)

    T = movie.shape[0]
    if project:
        prj = jax.lax.map(lambda s: project_timepoint_auto(
            s, reference_channel=reference_channel, airyscan=airyscan)[0],
            movie)                                         # (T, C, Y, X)
    else:
        prj = movie[:, :, 0].astype(jnp.float32)
    norm_img = jax.vmap(jax.vmap(normalize_channel))(prj)
    x = jnp.transpose(norm_img, (0, 3, 2, 1)).astype(jnp.bfloat16)  # (T, X, Y, C)
    sx, sy = x.shape[1], x.shape[2]
    px, py = find_desired_shape(sx, sy)
    x = jnp.pad(x, ((0, 0), (px - sx, 0), (py - sy, 0), (0, 0)))

    if quantized:
        from tissue_image_processing_tpu.models.quant import unet_int8_apply

        def fwd(xb):
            return unet_int8_apply(params, xb, depth=depth)
    else:
        from tissue_image_processing_tpu.models.unet import UNet
        model = UNet(depth=depth, base_filters=base_filters,
                     dtype=jnp.bfloat16, norm=norm)

        def fwd(xb):
            return model.apply(params, xb, train=False)

    B = _flood_batch(T, batch)

    def seg_group(xb):
        preds = fwd(xb)[:, px - sx:, py - sy:, :]
        labels, _hc = unet_postprocess_batch(preds.astype(jnp.float32))
        return labels

    labels = jax.lax.map(seg_group, x.reshape(T // B, B, *x.shape[1:]))
    labels = labels.reshape(T, *labels.shape[2:])
    tabs, overflow = jax.vmap(lambda l: frame_cellinfo_checked(
        l, capacity=capacity, neighbor_compact_k=192))(labels)
    refs = prj[:, reference_channel]                       # (T, Y, X)
    # the labels (and table cx/cy) live in x-major space while the drift
    # chain measures the (Y, X) projection; a transposed image's phase shift
    # is the swapped component pair, so swap columns to match
    if prev_ref is None:
        drifts = compute_drift_chain(refs)[:, ::-1]
    else:
        drifts = compute_drift_chain(
            jnp.concatenate([prev_ref[None], refs], axis=0))[1:, ::-1]
    return labels, tabs, drifts, overflow, refs[-1]


def movie_pipeline(movie: jnp.ndarray, *, reference_channel: int = 0,
                   threshold: float = 0.2, std: float = 3.0,
                   block_size: int = 101, capacity: int = 1024,
                   batch: int = 2, airyscan: bool = False,
                   search_range: float = 100.0, memory: int = 3,
                   drifts: Optional[np.ndarray] = None,
                   unet: Optional[dict] = None):
    """(T, C, Z, Y, X) movie -> dict with per-frame segment ``labels``
    (T, X, Y — the reference's transposed convention), stacked cell
    ``tables`` (CellTable of (T, capacity) arrays), ``drifts`` (T, 2) and
    tracked ``ids`` (T, capacity; 0 = no cell).

    Z == 1 skips the surface projection. Tracking uses the trackpy-faithful
    adaptive radii (reference ``adaptive_stop=10``): segmentation and tables
    run in one device program, the radii come from one host pass over the
    tables, and the tracking scan is a second small program.

    ``unet``: segment with the U-Net program instead of watershed — a dict
    from :meth:`SegmentationPredictor.pipeline_config` (params + the static
    model description); the movie's channels must then be (atoh, zo).
    """
    from tissue_image_processing_tpu.core.tracking import (
        adaptive_effective_ranges, track_movie)

    if movie.ndim != 5:
        raise ValueError(f"movie must be (T, C, Z, Y, X), got {movie.shape}")
    project = movie.shape[2] > 1
    if unet is not None:
        labels, tabs, dr, overflow, _last_ref = _segment_program_unet(
            movie, unet["params"], reference_channel=reference_channel,
            capacity=capacity, batch=unet.get("batch", 8), airyscan=airyscan,
            project=project, quantized=unet.get("quantized", False),
            depth=unet.get("depth", 3),
            base_filters=unet.get("base_filters", 128),
            norm=unet.get("norm", "shift"))
    else:
        labels, tabs, dr, overflow, _last_ref = _segment_program(
            movie, reference_channel=reference_channel, threshold=threshold,
            std=std, block_size=block_size, capacity=capacity, batch=batch,
            airyscan=airyscan, project=project)
    if drifts is None:
        drifts = np.asarray(dr)
    cy, cx, area, mask = (np.asarray(tabs.cy), np.asarray(tabs.cx),
                          np.asarray(tabs.area), np.asarray(tabs.valid_mask()))
    ranges = adaptive_effective_ranges(cy, cx, area, mask, drifts=drifts,
                                       search_range=search_range, per_cell=True)
    ids = track_movie(jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
                      jnp.asarray(mask), drifts=jnp.asarray(drifts, jnp.float32),
                      search_range=search_range, memory=memory,
                      capacity=2 * capacity,
                      search_ranges=jnp.asarray(ranges, jnp.float32))
    return {"labels": labels, "tables": tabs, "drifts": drifts,
            "ids": np.asarray(ids),
            # (T,) bool: frames whose compacted adjacency dropped pairs —
            # recompute those frames' tables with frame_cellinfo(compact=None)
            "neighbor_overflow": np.asarray(overflow)}


def movie_pipeline_chunked(store, *, chunk_frames: int,
                           reference_channel: int = 0, threshold: float = 0.2,
                           std: float = 3.0, block_size: int = 101,
                           capacity: int = 1024, batch: int = 2,
                           airyscan: bool = False,
                           search_range: float = 100.0, memory: int = 3,
                           on_chunk=None, keep_labels: bool = True,
                           unet: Optional[dict] = None,
                           channels: Optional[Sequence[int]] = None):
    """Streaming form of :func:`movie_pipeline` for movies larger than HBM.

    The reference's de-facto envelope is "any length movie, streamed" (dask
    lazy reads + per-frame ``.compute()``,
    ``basic_image_manipulations.py:59-62,89-159``, ``gui.py:442-444``); a
    production movie (~100 frames x 2 ch x 40 z x 2000^2 uint16 ~ 60 GB)
    cannot ride to a 16 GB chip as one array. This driver consumes ``store``
    (a :class:`~tissue_image_processing_tpu.io.movie.MovieStore` or any
    (T, C, Z, Y, X) array/memmap) in ``chunk_frames``-sized T-chunks through
    ONE compiled device program per chunk shape, carrying across boundaries:

    - the tracker's explicit scan state (:class:`TrackingState`) + cumulative
      drift, so chunked track ids == the whole-movie scan's ids exactly;
    - the previous chunk's last projected reference frame (stays on device),
      so ``drift[0]`` of each chunk is the true boundary shift;
    - the adaptive-radius carry (previous frame's transformed point set), so
      trackpy-faithful per-frame radii match the unchunked computation.

    The last partial chunk is padded by repeating the final frame and masked
    out via ``frame_valid`` so every chunk reuses the same executable.

    ``on_chunk(t0, chunk_dict)`` (labels/tables/ids/drifts/overflow of the
    REAL frames, host arrays) lets callers persist each chunk and drop it —
    with ``keep_labels=False`` peak host memory is one chunk's labels. Returns
    the same dict as :func:`movie_pipeline` (``labels`` is None when not
    kept).

    ``unet``: segment with the U-Net program (see :func:`movie_pipeline`);
    ``channels``: select these channels from each staged chunk (e.g. the
    (atoh, zo) pair the model expects) — selection happens on the decoded
    host chunk so lazy TIFF/CZI stores never materialize the movie.
    """
    import jax as _jax

    from tissue_image_processing_tpu.core.tracking import (
        TrackingState, adaptive_effective_ranges, track_movie)

    data = store.data if hasattr(store, "data") else store
    T = data.shape[0]
    if data.ndim != 5:
        raise ValueError(f"movie must be (T, C, Z, Y, X), got {data.shape}")
    C = max(1, min(int(chunk_frames), T))
    project = data.shape[2] > 1
    track_cap = 2 * capacity

    state = TrackingState.empty(track_cap)
    cum = jnp.zeros((2,), jnp.float32)
    prev_pts = None
    # the carried reference frame's space differs by segmenter: the watershed
    # program measures drift on the x-major transposed refs, the U-Net one on
    # the y-major projection (swapping the drift columns instead)
    prev_ref = (jnp.zeros((data.shape[3], data.shape[4]), jnp.float32)
                if unet is not None
                else jnp.zeros((data.shape[4], data.shape[3]), jnp.float32))
    all_ids, all_tabs, all_drifts, all_over, all_labels = [], [], [], [], []
    for ci, t0 in enumerate(range(0, T, C)):
        real = min(C, T - t0)
        chunk = np.asarray(data[t0:t0 + real])
        if channels is not None:
            chunk = chunk[:, list(channels)]
        if real < C:  # pad the tail so the device program shape is constant
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], C - real, axis=0)], axis=0)
        if unet is not None:
            labels, tabs, dr, overflow, last_ref = _segment_program_unet(
                jnp.asarray(chunk), unet["params"], prev_ref=prev_ref,
                reference_channel=reference_channel, capacity=capacity,
                batch=unet.get("batch", 8), airyscan=airyscan,
                project=project, quantized=unet.get("quantized", False),
                depth=unet.get("depth", 3),
                base_filters=unet.get("base_filters", 128),
                norm=unet.get("norm", "shift"))
        else:
            labels, tabs, dr, overflow, last_ref = _segment_program(
                jnp.asarray(chunk), prev_ref=prev_ref,
                reference_channel=reference_channel, threshold=threshold,
                std=std, block_size=block_size, capacity=capacity,
                batch=batch, airyscan=airyscan, project=project)
        # ONE batched device->host fetch for everything the host needs (the
        # scan state / prev_ref stay device-resident for the next chunk):
        # through the dev tunnel each separate read costs an RTT (up to
        # ~300 ms under load), and per-field reads dominated chunk wall time
        tabs_host, drifts, over_np, labels_np = _jax.device_get(
            (tabs, dr, overflow, labels))
        drifts = np.array(drifts)  # writable host copy
        if ci == 0:
            drifts[0] = 0.0  # frame 0 has no predecessor (prev_ref was zeros)
        valid = np.zeros((C,), bool)
        valid[:real] = True
        cy, cx, area = tabs_host.cy, tabs_host.cx, tabs_host.area
        # valid_mask is pure operators, so on the fetched numpy table it stays
        # on host — no device bounce
        mask = np.asarray(tabs_host.valid_mask()) & valid[:, None]
        ranges, prev_pts, _ = adaptive_effective_ranges(
            cy, cx, area, mask, drifts=drifts, search_range=search_range,
            prev_points=prev_pts, cum_drift_init=np.asarray(cum),
            return_carry=True, per_cell=True)
        ids, state, cum = track_movie(
            jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
            jnp.asarray(mask), drifts=jnp.asarray(drifts, jnp.float32),
            frame_valid=jnp.asarray(valid),
            search_range=search_range, memory=memory, capacity=track_cap,
            search_ranges=jnp.asarray(ranges, jnp.float32),
            init_state=state, cum_drift_init=cum, return_state=True)
        prev_ref = last_ref
        ids_np = np.asarray(ids)[:real]
        tabs_host = _jax.tree_util.tree_map(lambda x: x[:real], tabs_host)
        over_np = np.asarray(over_np)[:real]
        chunk_out = {"t0": t0, "labels": np.asarray(labels_np)[:real],
                     "tables": tabs_host, "ids": ids_np,
                     "drifts": drifts[:real], "neighbor_overflow": over_np}
        if on_chunk is not None:
            on_chunk(t0, chunk_out)
        if keep_labels and on_chunk is None:
            all_labels.append(chunk_out["labels"])
        all_ids.append(ids_np)
        all_tabs.append(tabs_host)
        all_drifts.append(drifts[:real])
        all_over.append(over_np)
    tables = _jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *all_tabs)
    return {"labels": (np.concatenate(all_labels, 0) if all_labels else None),
            "tables": tables,
            "drifts": np.concatenate(all_drifts, 0),
            "ids": np.concatenate(all_ids, 0),
            "neighbor_overflow": np.concatenate(all_over, 0)}
