"""Main pipeline CLI — the batch replacement for the reference's PyQt GUI
(``gui.py``): every worker-thread action (segment / U-Net segment / cell types /
track / find events / save / export, ``gui.py:1821-2136``) is a subcommand operating
on a movie + .seg session, with frames processed in device batches.

Usage examples:
  python -m tissue_image_processing_tpu.cli segment movie.tif --session out.seg
  python -m tissue_image_processing_tpu.cli unet movie.tif --weights w.h5 --session out.seg
  python -m tissue_image_processing_tpu.cli types --session out.seg movie.tif --channel 1 --name HC
  python -m tissue_image_processing_tpu.cli track --session out.seg movie.tif
  python -m tissue_image_processing_tpu.cli events --session out.seg
  python -m tissue_image_processing_tpu.cli export --session out.seg --format matlab out/
  python -m tissue_image_processing_tpu.cli analyze --session out.seg --feature area
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _load_movie(path):
    from tissue_image_processing_tpu.io.movie import MovieStore
    return MovieStore.open(path)


def _open_session(args, n_frames):
    from tissue_image_processing_tpu.core.tissue import Tissue

    tissue = Tissue(n_frames, args.movie if hasattr(args, "movie") else "session",
                    channel_names=getattr(args, "channels", None) or [],
                    capacity=args.capacity)
    if args.session and os.path.isfile(args.session):
        for _ in tissue.load(args.session):
            pass
    return tissue


def _save_session(tissue, args):
    if args.session:
        last = 0
        for pct in tissue.save(args.session):
            last = pct
        print(f"saved session -> {args.session}")


def cmd_segment(args):
    import jax
    import jax.numpy as jnp

    from tissue_image_processing_tpu.ops.watershed import watershed_segmentation

    store = _load_movie(args.movie)
    tissue = _open_session(args, store.num_frames)
    seg_fn = jax.jit(lambda img: watershed_segmentation(
        img, args.threshold, args.std, args.block_size))
    frames = range(args.initial, (args.final or store.num_frames) + 1)
    for f in frames:
        img = jnp.asarray(store.frame(f - 1)[args.channel, 0].T.astype(np.float32))
        labels = np.asarray(seg_fn(img))
        tissue.set_labels(f, labels, reset_data=True)
        tissue.calculate_frame_cellinfo(f)
        print(f"segmented frame {f}: {labels.max()} cells", flush=True)
    _save_session(tissue, args)


def _auto_chunk_frames(store, budget_bytes=2 << 30, multiple=1):
    """Frames per chunk so one staged chunk stays under ~2 GiB of HBM (the
    f32 intermediates inside the program peak at a few x that; 16 GB v5e has
    room). Chunks stage in the store's NATIVE dtype (uint16 for microscope
    data, but f32 stores are twice that). 0 = whole movie fits.

    ``multiple``: round the chunk down to a multiple of the per-launch batch
    — a prime chunk length (e.g. 17) would force _flood_batch down to B=1,
    costing the U-Net its >=8-batch conv tilings (~172 vs ~116 TF/s)."""
    itemsize = np.dtype(getattr(store.data, "dtype", np.uint16)).itemsize
    per_frame = int(np.prod(store.shape[1:])) * itemsize
    total = per_frame * store.num_frames
    if total <= budget_bytes:
        return 0
    chunk = max(1, budget_bytes // max(per_frame, 1))
    if multiple > 1 and chunk >= multiple:
        chunk -= chunk % multiple
    return chunk


def _build_unet_config(args, store, channels, reference_channel):
    """Predictor for `pipeline --unet`: load/fold weights, calibrate the int8
    scales on the movie's projected first frame, package for the fused
    program (SegmentationPredictor.pipeline_config).
    ``reference_channel`` indexes within the selected (atoh, zo) pair."""
    import jax.numpy as jnp

    from tissue_image_processing_tpu.models.predictor import (
        SegmentationPredictor)

    shape = tuple(store.shape[-2:])  # (Y, X) without decoding a frame
    pred = SegmentationPredictor(args.weights, (2,) + shape,
                                 depth=args.unet_depth,
                                 base_filters=args.unet_filters,
                                 quantize=args.quantize)
    if pred.quantize:
        from tissue_image_processing_tpu.projection.surface import (
            project_timepoint_auto)

        # the ONE frame decode of startup (lazy/zstd stores decode per touch)
        stack0 = store.frame(0)[list(channels)].astype(np.float32)
        if stack0.shape[1] > 1:
            prj0 = project_timepoint_auto(
                jnp.asarray(stack0), reference_channel=reference_channel)[0]
        else:
            prj0 = jnp.asarray(stack0[:, 0])
        pred.calibrate(np.asarray(prj0))
    return pred.pipeline_config(batch=args.unet_batch)


def cmd_pipeline(args):
    """Fused whole-movie run: proj -> watershed -> tables -> drift -> track in
    ONE device program (core/pipeline.py), then populate the session — the
    single-chip product form of the reference's segment-all + track workflow
    (gui.py:1348-1376, 1590-1603) without its per-frame host round-trips.
    Movies larger than HBM stream in T-chunks with tracking-state carry
    (movie_pipeline_chunked; --chunk to force a chunk size), matching the
    reference's any-length streamed envelope (gui.py:442-444)."""
    import jax
    import jax.numpy as jnp

    from tissue_image_processing_tpu.core.pipeline import (
        movie_pipeline, movie_pipeline_chunked)

    store = _load_movie(args.movie)
    tissue = _open_session(args, store.num_frames)
    kw = dict(reference_channel=args.channel, threshold=args.threshold,
              std=args.std, block_size=args.block_size, capacity=args.capacity,
              batch=args.batch, search_range=args.search_range,
              memory=args.memory)
    channels = None
    if getattr(args, "unet", False):
        # U-Net segmentation: the model consumes the (atoh, zo) channel pair
        # of the projected frame (reference gui.py:2055-2073); projection
        # still uses --channel as the reference within that pair
        channels = (args.atoh_channel, args.zo_channel)
        # --channel names a STORE channel; inside the selected (atoh, zo)
        # pair it sits at its pair index (min(channel, 1) was wrong for any
        # pair other than (0, 1))
        ref_in_pair = (channels.index(args.channel)
                       if args.channel in channels else 0)
        kw["reference_channel"] = ref_in_pair
        kw["unet"] = _build_unet_config(args, store, channels, ref_in_pair)
    per_launch = (args.unet_batch if getattr(args, "unet", False)
                  else args.batch)
    chunk = (args.chunk if args.chunk is not None
             else _auto_chunk_frames(store, multiple=per_launch))
    overflow_frames = []

    def apply_frames(t0, labels, tabs, ids_c, masks, overflow):
        for i in range(labels.shape[0]):
            f = t0 + i + 1
            tissue.set_labels(f, labels[i], reset_data=True)
            t = jax.tree_util.tree_map(lambda x: x[i], tabs)
            if overflow[i]:
                # this frame's compacted adjacency dropped pairs (>192 vote
                # runs in some label row) — recompute with the exact scatter
                from tissue_image_processing_tpu.core.cell_table import (
                    frame_cellinfo)
                t = jax.tree_util.tree_map(np.asarray, frame_cellinfo(
                    jnp.asarray(labels[i]), capacity=args.capacity))
                overflow_frames.append(f)
            tissue.apply_track_ids(f, t, ids_c[i], masks[i])

    if chunk and chunk < store.num_frames:
        print(f"streaming {store.num_frames} frames in chunks of {chunk}",
              flush=True)
        ids_all = []

        def sink(t0, c):
            tabs = c["tables"]
            apply_frames(t0, c["labels"], tabs, c["ids"], tabs.valid_mask(),
                         c["neighbor_overflow"])
            tissue.drifts[t0:t0 + c["ids"].shape[0]] = c["drifts"]
            ids_all.append(c["ids"])
            print(f"  frames {t0 + 1}-{t0 + c['ids'].shape[0]} done",
                  flush=True)

        movie_pipeline_chunked(store, chunk_frames=chunk, on_chunk=sink,
                               keep_labels=False, channels=channels, **kw)
        ids = np.concatenate(ids_all, axis=0)
    else:
        data = store.data
        if channels is not None:
            data = np.asarray(data)[:, list(channels)]
        out = movie_pipeline(jnp.asarray(data), **kw)
        labels = np.asarray(out["labels"])
        ids = out["ids"]
        # ONE stacked device->host conversion for all tables: per-frame reads
        # would cost ~27 ms each through a dev tunnel (bench.py methodology)
        tabs = jax.tree_util.tree_map(np.asarray, out["tables"])
        apply_frames(0, labels, tabs, ids, tabs.valid_mask(),
                     out["neighbor_overflow"])
        tissue.drifts[:store.num_frames] = out["drifts"]
    n_tracked = int((ids > 0).any(0).sum())
    print(f"pipeline: {store.num_frames} frames, "
          f"{int((ids[0] > 0).sum())} cells in frame 1, "
          f"{n_tracked} tracks", flush=True)
    if overflow_frames:
        print("adjacency overflow: frames "
              f"{', '.join(map(str, overflow_frames))} recomputed with the "
              "exact neighbor scatter", flush=True)
    if args.events:
        for _ in tissue.find_events_iterator(1, store.num_frames):
            pass
        print(f"events: {len(tissue.events)} found", flush=True)
    _save_session(tissue, args)


def cmd_unet(args):
    import jax.numpy as jnp

    from tissue_image_processing_tpu.models.predictor import SegmentationPredictor

    store = _load_movie(args.movie)
    tissue = _open_session(args, store.num_frames)
    shape = store.frame(0)[0, 0].shape
    pred = SegmentationPredictor(args.weights, (2,) + shape,
                                 quantize=args.quantize)
    frames = list(range(args.initial, (args.final or store.num_frames) + 1))
    # frames go through the U-Net in batches of 8: XLA's conv tilings reach
    # ~172 TF/s at B=8 vs ~116 TF/s at B=1 on v5e (probe_unet_batch.py), and
    # the post-process floods as stacked Pallas launches (watershed_batch)
    for g in range(0, len(frames), 8):
        group = frames[g:g + 8]
        imgs = np.stack([store.frame(f - 1)[[args.atoh_channel,
                                             args.zo_channel], 0]
                         for f in group]).astype(np.float32)
        labels_b, hc_b = pred.predict_batch(jnp.asarray(imgs))
        labels_b = np.asarray(labels_b)
        for f, labels in zip(group, labels_b):
            tissue.set_labels(f, labels, reset_data=True)
            tissue.calculate_frame_cellinfo(f)
            print(f"unet-segmented frame {f}: {int(labels.max())} cells",
                  flush=True)
    _save_session(tissue, args)


def cmd_types(args):
    store = _load_movie(args.movie)
    tissue = _open_session(args, store.num_frames)
    for f in range(1, store.num_frames + 1):
        if tissue.get_labels(f) is None:
            continue
        marker = store.frame(f - 1)[args.channel, 0].T.astype(np.float32)
        tissue.calc_cell_types(marker, f, args.name, threshold=args.threshold,
                               percentage_above_threshold=args.percentage)
        print(f"typed frame {f}", flush=True)
    _save_session(tissue, args)


def cmd_track(args):
    store = _load_movie(args.movie) if args.movie else None
    n = store.num_frames if store else args.frames
    tissue = _open_session(args, n)
    images = None
    if store is not None and args.use_images:
        images = store.data[:, args.channel, 0].transpose(0, 2, 1)
    tissue.track_cells(images=images, search_range=args.search_range,
                       memory=args.memory)
    if args.fix_types:
        tissue.fix_cell_types_after_tracking()
    print(f"tracked {n} frames; {tissue.get_cells_number()} tracks")
    _save_session(tissue, args)


def cmd_events(args):
    tissue = _open_session(args, args.frames)
    tissue.find_events(differentiation_type_name=args.type_name)
    ev = tissue.get_events()
    print(ev.groupby("type").size().to_string() if len(ev) else "no events found")
    _save_session(tissue, args)


def cmd_export(args):
    from tissue_image_processing_tpu.core import export as X

    tissue = _open_session(args, args.frames)
    os.makedirs(args.outdir, exist_ok=True)
    name = args.name or "export"
    if args.format == "matlab":
        X.export_segmentation_to_matlab(tissue, args.outdir, name)
    elif args.format == "tiff":
        X.export_segmentation_to_tiff(tissue, args.outdir, name)
    elif args.format == "tiff+types":
        X.export_segmentation_and_cell_types_to_tiff(tissue, args.outdir, name)
    elif args.format == "npy":
        X.export_segmentation_to_npy(tissue, args.outdir, name)
    elif args.format == "events":
        from tissue_image_processing_tpu.core.export import write_table
        write_table(tissue.get_events(), os.path.join(args.outdir, name + ".csv"))
    print(f"exported -> {args.outdir}")


def cmd_analyze(args):
    from tissue_image_processing_tpu.core.frame_data import get_frame_data
    import pandas as pd

    tissue = _open_session(args, args.frames)
    rows = []
    for f in range(1, args.frames + 1):
        if tissue.get_cells_info(f) is None:
            continue
        mask = tissue.get_valid_non_edge_mask(f)
        data, msg = get_frame_data(tissue, f, args.feature, mask)
        if data is None:
            print(f"frame {f}: {msg}")
            continue
        arr = np.atleast_1d(np.asarray(data, float))
        rows.append({"frame": f, "mean": arr.mean(), "std": arr.std(),
                     "n": arr.size})
    df = pd.DataFrame(rows)
    print(df.to_string(index=False))
    if args.out:
        from tissue_image_processing_tpu.core.export import write_table
        write_table(df, args.out)
    if getattr(args, "interactive", False):
        _embed_console({"tissue": tissue, "df": df, "args": args})


def cmd_warmup(args):
    """Ahead-of-time compile of the fused pipeline's device programs for a
    given movie shape (VERDICT r3: cold-start compile accounting). With the
    persistent compilation cache (enabled by default in main()), a later
    ``cli pipeline`` run on the same shapes starts warm — the ~minutes-long
    XLA compile of the flood/projection chain happens here instead of inside
    the production run."""
    import time

    import jax
    import jax.numpy as jnp

    from tissue_image_processing_tpu.core.pipeline import (_segment_program,
                                                           _segment_program_unet)
    from tissue_image_processing_tpu.core.tracking import (TrackingState,
                                                           track_movie)

    T, C, Z, H, W = args.frames, args.channels_n, args.zdepth, args.size, args.size
    movie = jax.ShapeDtypeStruct((T, C, Z, H, W), jnp.uint16)
    prev_ref = jax.ShapeDtypeStruct((W, H), jnp.float32)
    # compile EXACTLY the jaxprs the product paths call — movie_pipeline runs
    # the segment program with prev_ref=None and movie_pipeline_chunked with a
    # carried reference frame, and BOTH pass per-cell (T, capacity) radii
    # (adaptive_effective_ranges(per_cell=True)); any aval mismatch here would
    # miss the persistent cache and recompile inside the production run
    if getattr(args, "unet", False):
        from tissue_image_processing_tpu.models.predictor import (
            SegmentationPredictor)

        pred = SegmentationPredictor(None, (2, H, W), depth=args.unet_depth,
                                     base_filters=args.unet_filters,
                                     quantize=args.quantize)
        if pred.quantize:
            # activation-scale VALUES are data, but the qparams pytree
            # STRUCTURE is shape-independent — a tiny dummy calibration
            # yields the right avals for the compile
            pred.calibrate(np.zeros((2, 64, 64), np.float32) + 1.0)
        cfg = pred.pipeline_config(batch=args.unet_batch)
        params_avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            cfg["params"])
        uprev = jax.ShapeDtypeStruct((H, W), jnp.float32)
        movie2 = jax.ShapeDtypeStruct((T, 2, Z, H, W), jnp.uint16)
        pair = (args.atoh_channel, args.zo_channel)
        ref_in_pair = pair.index(args.channel) if args.channel in pair else 0
        for tag, pr in (("whole-movie", None), ("chunked", uprev)):
            t0 = time.time()
            _segment_program_unet.lower(
                movie2, params_avals, prev_ref=pr,
                reference_channel=ref_in_pair,
                capacity=args.capacity, batch=cfg["batch"], project=Z > 1,
                quantized=cfg["quantized"], depth=cfg["depth"],
                base_filters=cfg["base_filters"],
                norm=cfg["norm"]).compile()
            print(f"unet segment program [{tag}] ({T}x2x{Z}x{H}x{W}"
                  f"{', int8' if cfg['quantized'] else ''}): compiled in "
                  f"{time.time() - t0:.1f}s", flush=True)
    else:
        for tag, pr in (("whole-movie", None), ("chunked", prev_ref)):
            t0 = time.time()
            _segment_program.lower(
                movie, prev_ref=pr, reference_channel=args.channel,
                threshold=args.threshold, std=args.std,
                block_size=args.block_size, capacity=args.capacity,
                batch=args.batch, project=Z > 1).compile()
            print(f"segment program [{tag}] ({T}x{C}x{Z}x{H}x{W}): compiled "
                  f"in {time.time() - t0:.1f}s", flush=True)
    col = jax.ShapeDtypeStruct((T, args.capacity), jnp.float32)
    mask = jax.ShapeDtypeStruct((T, args.capacity), jnp.bool_)
    ranges = jax.ShapeDtypeStruct((T, args.capacity), jnp.float32)
    drifts = jax.ShapeDtypeStruct((T, 2), jnp.float32)
    cap2 = 2 * args.capacity
    t1 = time.time()
    track_movie.lower(
        col, col, col, mask, drifts=drifts,
        search_range=args.search_range, memory=args.memory, capacity=cap2,
        search_ranges=ranges).compile()
    print(f"tracking program [whole-movie] (T={T}, cap={cap2}): compiled in "
          f"{time.time() - t1:.1f}s", flush=True)
    state = TrackingState(
        pos=jax.ShapeDtypeStruct((cap2, 2), jnp.float32),
        sqrt_area=jax.ShapeDtypeStruct((cap2,), jnp.float32),
        track_id=jax.ShapeDtypeStruct((cap2,), jnp.int32),
        age=jax.ShapeDtypeStruct((cap2,), jnp.int32),
        next_id=jax.ShapeDtypeStruct((), jnp.int32))
    t1 = time.time()
    track_movie.lower(
        col, col, col, mask, drifts=drifts,
        frame_valid=jax.ShapeDtypeStruct((T,), jnp.bool_),
        search_range=args.search_range, memory=args.memory, capacity=cap2,
        search_ranges=ranges, init_state=state,
        cum_drift_init=jax.ShapeDtypeStruct((2,), jnp.float32),
        return_state=True).compile()
    print(f"tracking program [chunked] (T={T}, cap={cap2}): compiled in "
          f"{time.time() - t1:.1f}s", flush=True)
    print("warm cache ready: cli pipeline on these shapes skips these compiles",
          flush=True)


def cmd_view(args):
    """Open the interactive napari viewer over a session — the product form of
    the reference's main window (``gui.py:225-1819``): channel/labels/types/
    event layers with click modes for segmentation fixes, type changes and
    event marking (``viz/napari_viewer.py``). Edits persist to ``--session``
    when the window closes."""
    import napari  # fail early with napari's own message if absent

    from tissue_image_processing_tpu.viz.napari_viewer import TissueViewer

    images = None
    n = args.frames
    if args.movie:
        store = _load_movie(args.movie)
        n = store.num_frames
        data = np.asarray(store.data)          # (T, C, Z, Y, X)
        # display the z-projected movie like the reference's projected view
        images = data.max(axis=2) if data.ndim == 5 else data
    tissue = _open_session(args, n)
    viewer = TissueViewer(tissue, images=images, frame=args.frame,
                          type_name=args.type_name)
    viewer.mode = args.mode
    napari.run()
    _save_session(tissue, args)
    return viewer


def _embed_console(ns):
    """Live console over the session objects — the analog of the reference's
    embedded Jupyter console (``gui.py:288-298``): IPython when present,
    code.interact otherwise."""
    banner = ("tissue_image_processing_tpu interactive session\n"
              f"objects: {', '.join(sorted(ns))}")
    try:
        from IPython import embed
        embed(banner1=banner, user_ns=ns, colors="neutral")
    except ImportError:
        import code
        code.interact(banner=banner, local=ns)


def build_parser():
    p = argparse.ArgumentParser(prog="tip", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, movie=True):
        if movie:
            sp.add_argument("movie", nargs="?", default=None)
        sp.add_argument("--session", default=None, help=".seg session path")
        sp.add_argument("--config", default=None,
                        help="PipelineConfig JSON; CLI flags override its values")
        sp.add_argument("--capacity", type=int, default=None)
        sp.add_argument("--frames", type=int, default=1)

    sp = sub.add_parser("segment", help="watershed segmentation")
    sp.add_argument("movie")
    sp.add_argument("--session", default=None)
    sp.add_argument("--config", default=None,
                    help="PipelineConfig JSON; CLI flags override its values")
    sp.add_argument("--capacity", type=int, default=None)
    sp.add_argument("--channel", type=int, default=0)
    sp.add_argument("--threshold", type=float, default=None)
    sp.add_argument("--std", type=float, default=None)
    sp.add_argument("--block-size", dest="block_size", type=int, default=None)
    sp.add_argument("--initial", type=int, default=1)
    sp.add_argument("--final", type=int, default=0)
    sp.set_defaults(fn=cmd_segment)

    sp = sub.add_parser("pipeline",
                        help="fused whole-movie proj->segment->track run")
    sp.add_argument("movie")
    sp.add_argument("--session", default=None)
    sp.add_argument("--config", default=None,
                    help="PipelineConfig JSON; CLI flags override its values")
    sp.add_argument("--capacity", type=int, default=None)
    sp.add_argument("--channel", type=int, default=0)
    sp.add_argument("--threshold", type=float, default=None)
    sp.add_argument("--std", type=float, default=None)
    sp.add_argument("--block-size", dest="block_size", type=int, default=None)
    sp.add_argument("--batch", type=int, default=2,
                    help="frames per stacked flood launch")
    sp.add_argument("--chunk", type=int, default=None,
                    help="frames per streamed T-chunk (movies larger than HBM"
                         "; default: auto — whole movie when it fits, else "
                         "~2 GiB chunks with tracking-state carry)")
    # None defaults so _apply_config can resolve CLI > config > builtin
    sp.add_argument("--search-range", dest="search_range", type=float,
                    default=None)
    sp.add_argument("--memory", type=int, default=None)
    sp.add_argument("--events", action="store_true",
                    help="run event detection after tracking")
    sp.add_argument("--unet", action="store_true",
                    help="segment with the U-Net instead of watershed (the "
                         "reference's GUI U-Net workflow, gui.py:1391-1407, "
                         "as one fused streamed program)")
    sp.add_argument("--weights", default=None,
                    help="Keras .h5 / saved U-Net weights (with --unet)")
    sp.add_argument("--quantize", action="store_true",
                    help="int8 U-Net inference (calibrates on the projected "
                         "first frame; ~1.5x the bf16 forward)")
    sp.add_argument("--atoh-channel", dest="atoh_channel", type=int, default=0)
    sp.add_argument("--zo-channel", dest="zo_channel", type=int, default=1)
    sp.add_argument("--unet-batch", dest="unet_batch", type=int, default=8,
                    help="frames per U-Net forward (8 = best MXU rate)")
    sp.add_argument("--unet-depth", dest="unet_depth", type=int, default=3,
                    help="down-blocks (3 = the reference's inference net, "
                         "2 = its training variant, train.py:167-177)")
    sp.add_argument("--unet-filters", dest="unet_filters", type=int,
                    default=128, help="first conv block's filter count")
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("unet", help="U-Net segmentation")
    sp.add_argument("movie")
    sp.add_argument("--session", default=None)
    sp.add_argument("--config", default=None,
                    help="PipelineConfig JSON; CLI flags override its values")
    sp.add_argument("--capacity", type=int, default=None)
    sp.add_argument("--weights", default=None)
    sp.add_argument("--atoh-channel", dest="atoh_channel", type=int, default=0)
    sp.add_argument("--zo-channel", dest="zo_channel", type=int, default=1)
    sp.add_argument("--initial", type=int, default=1)
    sp.add_argument("--final", type=int, default=0)
    sp.add_argument("--quantize", action="store_true",
                    help="int8 inference path (models/quant.py; ~1.54x faster "
                         "forward end-to-end, output within quantization noise)")
    sp.set_defaults(fn=cmd_unet)

    sp = sub.add_parser("types", help="classify cell types by marker channel")
    sp.add_argument("movie")
    sp.add_argument("--session", default=None)
    sp.add_argument("--config", default=None,
                    help="PipelineConfig JSON; CLI flags override its values")
    sp.add_argument("--capacity", type=int, default=None)
    sp.add_argument("--channel", type=int, default=0)
    sp.add_argument("--name", default="HC")
    sp.add_argument("--threshold", type=float, default=0.1)
    sp.add_argument("--percentage", type=float, default=90)
    sp.set_defaults(fn=cmd_types)

    sp = sub.add_parser("track", help="track cells over the movie")
    common(sp)
    sp.add_argument("--channel", type=int, default=0)
    sp.add_argument("--search-range", dest="search_range", type=float, default=None)
    sp.add_argument("--memory", type=int, default=None)
    sp.add_argument("--use-images", dest="use_images", action="store_true")
    sp.add_argument("--fix-types", dest="fix_types", action="store_true")
    sp.set_defaults(fn=cmd_track)

    sp = sub.add_parser("events", help="detect division/delamination/differentiation")
    common(sp, movie=False)
    sp.add_argument("--type-name", dest="type_name", default="")
    sp.set_defaults(fn=cmd_events)

    sp = sub.add_parser("export", help="export segmentation / events")
    common(sp, movie=False)
    sp.add_argument("outdir")
    sp.add_argument("--format", default="matlab",
                    choices=["matlab", "tiff", "tiff+types", "npy", "events"])
    sp.add_argument("--name", default=None)
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("analyze", help="per-frame feature statistics")
    common(sp, movie=False)
    sp.add_argument("--feature", default="area")
    sp.add_argument("--out", default=None)
    sp.add_argument("--interactive", action="store_true",
                    help="drop into a live console (IPython if installed) "
                         "with the session objects after the analysis")
    sp.set_defaults(fn=cmd_analyze)

    sp = sub.add_parser("warmup",
                        help="ahead-of-time compile of the pipeline programs "
                             "for a movie shape (fills the persistent cache)")
    sp.add_argument("--config", default=None,
                    help="PipelineConfig JSON; CLI flags override its values")
    sp.add_argument("--frames", type=int, default=8,
                    help="chunk length T the pipeline will run with")
    sp.add_argument("--size", type=int, default=1024)
    sp.add_argument("--zdepth", type=int, default=30)
    sp.add_argument("--channels-n", dest="channels_n", type=int, default=2)
    sp.add_argument("--capacity", type=int, default=None)
    sp.add_argument("--channel", type=int, default=0)
    sp.add_argument("--threshold", type=float, default=None)
    sp.add_argument("--std", type=float, default=None)
    sp.add_argument("--block-size", dest="block_size", type=int, default=None)
    sp.add_argument("--batch", type=int, default=2)
    sp.add_argument("--search-range", dest="search_range", type=float,
                    default=None)
    sp.add_argument("--memory", type=int, default=None)
    sp.add_argument("--unet", action="store_true",
                    help="warm the U-Net pipeline program instead of the "
                         "watershed one (pair with pipeline --unet)")
    sp.add_argument("--quantize", action="store_true")
    sp.add_argument("--atoh-channel", dest="atoh_channel", type=int, default=0)
    sp.add_argument("--zo-channel", dest="zo_channel", type=int, default=1)
    sp.add_argument("--unet-depth", dest="unet_depth", type=int, default=3)
    sp.add_argument("--unet-filters", dest="unet_filters", type=int,
                    default=128)
    sp.add_argument("--unet-batch", dest="unet_batch", type=int, default=8)
    sp.set_defaults(fn=cmd_warmup)

    sp = sub.add_parser("view", help="interactive napari viewer over a session")
    common(sp)
    sp.add_argument("--frame", type=int, default=1)
    sp.add_argument("--mode", default="none",
                    choices=["none", "add_line", "remove_line", "change_type",
                             "mark_event"],
                    help="initial click mode (reference gui.py:776-839)")
    sp.add_argument("--type-name", default="HC",
                    help="cell type assigned by change_type clicks")
    sp.set_defaults(fn=cmd_view)
    return p


def _apply_config(args):
    """Resolve unset flags from the PipelineConfig (CLI > config file > builtin
    defaults) and attach the config as ``args.cfg`` — the single knob store the
    reference never had (SURVEY 5.6)."""
    from tissue_image_processing_tpu.config import PipelineConfig

    cfg = (PipelineConfig.from_json(args.config)
           if getattr(args, "config", None) else PipelineConfig())
    mapping = {
        "capacity": cfg.cells.max_cells,
        "threshold": cfg.segmentation.threshold,
        "std": cfg.segmentation.std,
        "block_size": cfg.segmentation.block_size,
        "search_range": cfg.tracking.search_range,
        "memory": cfg.tracking.memory,
    }
    # (the types subcommand's --threshold keeps its own 0.1 default — it is the
    # marker threshold, not the watershed one, so it never arrives as None)
    for attr, value in mapping.items():
        if hasattr(args, attr) and getattr(args, attr) is None:
            setattr(args, attr, value)
    args.cfg = cfg
    return args


def main(argv=None) -> int:
    args = _apply_config(build_parser().parse_args(argv))
    # persistent XLA compile cache by default: the fused pipeline's cold
    # compile is minutes-long (docs/PERFORMANCE.md); cached executables make
    # every later run (and `cli warmup` pre-fills) start warm
    from tissue_image_processing_tpu.utils.runtime import (
        enable_compilation_cache)
    enable_compilation_cache()
    args.fn(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
