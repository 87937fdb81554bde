import os

import numpy as np
import pytest

from tissue_image_processing_tpu.io.movie_tools import (
    split_large_movie, crop_section_by_track, convert_series_to_store)
from tissue_image_processing_tpu.io.tiff import read_tiff


def small_movie(T=3, C=2, Z=2, Y=48, X=48, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((T, C, Z, Y, X)) * 1000).astype(np.float32)


def test_split_large_movie(tmp_path):
    m = small_movie()
    p = os.path.join(tmp_path, "movie.npy")
    np.save(p, m)
    outs = split_large_movie(p, str(tmp_path))
    assert len(outs) == 3
    img, axes, shape, _ = read_tiff(outs[0])
    assert shape == (2, 2, 48, 48)


def test_crop_section_by_track():
    m = small_movie()
    out = crop_section_by_track(m, [(24, 24), (26, 25), (28, 26)], radius=8)
    assert out.shape == (3, 2, 2, 16, 16)
    np.testing.assert_array_equal(out[0, 0, 0], m[0, 0, 0, 16:32, 16:32])


def test_convert_series_to_store(tmp_path):
    m1 = small_movie(T=2, Y=40, X=40)
    m2 = small_movie(T=3, Y=48, X=48, seed=1)
    p1 = os.path.join(tmp_path, "m1.npy")
    p2 = os.path.join(tmp_path, "m2.npy")
    np.save(p1, m1)
    np.save(p2, m2)
    out = convert_series_to_store([p1, p2], os.path.join(tmp_path, "store.npy"))
    arr = np.load(out, mmap_mode="r")
    assert arr.shape == (5, 2, 2, 48, 48)
    np.testing.assert_allclose(arr[0, 0, 0, :40, :40], m1[0, 0, 0])
    np.testing.assert_allclose(arr[2], m2[0])


def _grid_movie(tmp_path, T=3):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tissue import grid_labels
    lab = grid_labels()
    membrane = (lab == 0).astype(np.float32) * 50000 + 100
    movie = np.zeros((T, 2, 1, 64, 64), np.float32)
    for t in range(T):
        movie[t, 0, 0] = membrane.T  # CLI transposes back
        movie[t, 1, 0] = ((lab == 15) * 40000).astype(np.float32).T
    p = os.path.join(tmp_path, "movie.npy")
    np.save(p, movie)
    return p


def test_cli_pipeline(tmp_path):
    from tissue_image_processing_tpu.cli import main
    movie = _grid_movie(tmp_path)
    session = os.path.join(tmp_path, "s.seg")
    assert main(["segment", movie, "--session", session, "--capacity", "256",
                 "--threshold", "0.3", "--std", "1.0", "--block-size", "21"]) == 0
    assert os.path.exists(session)
    assert main(["types", movie, "--session", session, "--capacity", "256",
                 "--channel", "1", "--name", "HC", "--threshold", "0.3"]) == 0
    assert main(["track", movie, "--session", session, "--capacity", "256"]) == 0
    assert main(["events", "--session", session, "--capacity", "256",
                 "--frames", "3"]) == 0
    outdir = os.path.join(tmp_path, "out")
    assert main(["export", "--session", session, "--capacity", "256",
                 "--frames", "3", outdir, "--format", "matlab"]) == 0
    assert os.path.exists(os.path.join(outdir, "export.mat"))
    assert main(["analyze", "--session", session, "--capacity", "256",
                 "--frames", "3", "--feature", "area"]) == 0
    # --interactive embeds a console over the session objects (gui.py:288-298
    # analog); stub the embedder and check the namespace it receives
    import tissue_image_processing_tpu.cli as climod
    seen = {}
    orig = climod._embed_console
    climod._embed_console = lambda ns: seen.update(ns)
    try:
        assert main(["analyze", "--session", session, "--capacity", "256",
                     "--frames", "3", "--feature", "area",
                     "--interactive"]) == 0
    finally:
        climod._embed_console = orig
    assert "tissue" in seen and "df" in seen and len(seen["df"]) > 0


def test_cli_fused_pipeline_matches_per_frame(tmp_path):
    """`cli pipeline` (one fused device program, core/pipeline.py) must
    reproduce the per-frame segment+track path: identical label maps and
    identical track-id columns (the grid movie is static, so drift = 0 in
    both paths)."""
    from tissue_image_processing_tpu.cli import main
    from tissue_image_processing_tpu.core.tissue import Tissue

    movie = _grid_movie(tmp_path)
    s1 = os.path.join(tmp_path, "p.seg")
    s2 = os.path.join(tmp_path, "q.seg")
    seg_flags = ["--capacity", "256", "--threshold", "0.3", "--std", "1.0",
                 "--block-size", "21"]
    assert main(["pipeline", movie, "--session", s1] + seg_flags) == 0
    assert main(["segment", movie, "--session", s2] + seg_flags) == 0
    assert main(["track", movie, "--session", s2, "--capacity", "256"]) == 0
    ta = Tissue(3, os.path.join(tmp_path, "a"), capacity=256)
    tb = Tissue(3, os.path.join(tmp_path, "b"), capacity=256)
    for _ in ta.load(s1):
        pass
    for _ in tb.load(s2):
        pass
    for f in (1, 2, 3):
        np.testing.assert_array_equal(ta.get_labels(f), tb.get_labels(f))
        np.testing.assert_array_equal(
            np.asarray(ta.get_cells_info(f).label),
            np.asarray(tb.get_cells_info(f).label))


def test_cli_unet_batched(tmp_path):
    """cmd_unet segments frames in predict_batch groups (reference
    UnetSegmentationThread gui.py:2055-2073 went one frame at a time)."""
    from tissue_image_processing_tpu.cli import main
    movie = _grid_movie(tmp_path)  # T=3: one partial group of 3 via the loop
    session = os.path.join(tmp_path, "u.seg")
    assert main(["unet", movie, "--session", session,
                 "--capacity", "256"]) == 0  # random-init weights
    from tissue_image_processing_tpu.core.tissue import Tissue
    t = Tissue(3, os.path.join(tmp_path, "check"), capacity=256)
    for _ in t.load(session):
        pass
    # every frame got a label map of the movie's (transposed) shape
    for f in (1, 2, 3):
        lab = t.get_labels(f)
        assert lab is not None and lab.shape == (64, 64)


def test_maintenance_fixups():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tissue import make_tissue
    from tissue_image_processing_tpu.utils import maintenance as M

    tissue = make_tissue(T=2)
    tissue.track_cells()
    # duplicate a label then repair
    import dataclasses
    import jax.numpy as jnp
    t = tissue.get_cells_info(1)
    ids = np.asarray(t.label).copy()
    ids[1] = ids[0]
    tissue.set_cells_info(1, dataclasses.replace(t, label=jnp.asarray(ids)))
    M.fix_duplicated_label_cells_in_frame(tissue, 1)
    ids2 = np.asarray(tissue.get_cells_info(1).label)
    exists = np.asarray(tissue.get_cells_info(1).empty_cell) == 0
    vals, counts = np.unique(ids2[exists & (ids2 > 0)], return_counts=True)
    assert counts.max() == 1
    # zero-label repair
    ids3 = ids2.copy()
    ids3[2] = 0
    tissue.set_cells_info(1, dataclasses.replace(
        tissue.get_cells_info(1), label=jnp.asarray(ids3)))
    M.fix_zero_labeled_cells(tissue)
    ids4 = np.asarray(tissue.get_cells_info(1).label)
    assert (ids4[exists] > 0).all()
    # flip
    area_before = np.asarray(tissue.get_cells_info(1).area).copy()
    cx_before = np.asarray(tissue.get_cells_info(1).cx).copy()
    M.flip_all_data(tissue)
    np.testing.assert_allclose(np.asarray(tissue.get_cells_info(1).cy), cx_before)
    avg = M.calculate_average_area_in_movie(tissue)
    assert avg > 0


def test_runtime_timer_and_cache(tmp_path):
    from tissue_image_processing_tpu.utils.runtime import Timer, enable_compilation_cache
    import jax.numpy as jnp
    enable_compilation_cache(str(tmp_path / "cache"))
    t = Timer()
    with t.stage("x", result=jnp.ones(3)):
        _ = jnp.ones((8, 8)).sum()
    assert "x" in t.stages and t.stages["x"] >= 0
    assert "x=" in t.report()


def test_pipeline_config_json_roundtrip_and_cli_threading(tmp_path):
    import json
    from tissue_image_processing_tpu.config import PipelineConfig
    from tissue_image_processing_tpu.cli import build_parser, _apply_config

    cfg = PipelineConfig().replace(
        segmentation=PipelineConfig().segmentation.__class__(
            threshold=0.33, block_size=51, std=2.0))
    path = os.path.join(str(tmp_path), "cfg.json")
    cfg.to_json(path)
    back = PipelineConfig.from_json(path)
    assert back.segmentation.threshold == 0.33
    assert back.projection.score_blur_std == (0.5, 30.0, 30.0)

    # config file seeds unset flags; explicit flags win
    args = build_parser().parse_args(
        ["segment", "m.tif", "--config", path, "--std", "4.5"])
    args = _apply_config(args)
    assert args.threshold == 0.33      # from config
    assert args.block_size == 51       # from config
    assert args.std == 4.5             # flag overrides config
    assert args.capacity == 4096       # builtin default via config
    assert args.cfg.segmentation.block_size == 51

    # no config file: builtin defaults
    args2 = _apply_config(build_parser().parse_args(["segment", "m.tif"]))
    assert args2.threshold == 0.2 and args2.block_size == 101

    # track flags resolve from tracking config
    args3 = _apply_config(build_parser().parse_args(["track", "m.tif"]))
    assert args3.search_range == 100.0 and args3.memory == 3


def test_stage_metrics_records_and_emits(tmp_path):
    import io
    import json as _json
    from tissue_image_processing_tpu.utils.runtime import StageMetrics

    buf = io.StringIO()
    m = StageMetrics(stream=buf, run="r1")
    with m.stage("project", position=1, movie=2):
        pass
    m.emit("skip_existing", position=2)
    lines = [_json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["event"] == "stage" and lines[0]["stage"] == "project"
    assert lines[0]["run"] == "r1" and lines[0]["position"] == 1
    assert "seconds" in lines[0]
    assert lines[1]["event"] == "skip_existing"
    assert "project" in m.summary()
    # errors are recorded and re-raised
    import pytest
    with pytest.raises(ValueError):
        with m.stage("boom"):
            raise ValueError("x")
    assert any(r["event"] == "stage_error" for r in m.records)


def test_external_segmentation_ingest(tmp_path):
    """EPySeg-style external outputs (gui.py:2081-2136): frame_<N>_* boundary
    images appear in a folder, stabilize, and load as frame labels."""
    import numpy as np
    from tissue_image_processing_tpu.core.tissue import Tissue
    from tissue_image_processing_tpu.io.external_seg import (
        ingest_external_segmentation, load_external_labels)

    t = Tissue(2, os.path.join(str(tmp_path), "m.tif"), channel_names=[],
               capacity=64)
    # boundary image: 255 = boundary/background, else cell interior
    img = np.full((32, 32), 255, np.uint8)
    img[2:15, 2:15] = 0
    img[18:30, 18:30] = 0
    outdir = tmp_path / "predict"
    outdir.mkdir()
    np.save(outdir / "frame_1_seg.npy", img)
    np.save(outdir / "frame_2_seg.npy", img.T.copy())
    prog = list(ingest_external_segmentation(
        t, str(outdir), n_frames=2, poll_interval=0.01, stable_checks=1,
        timeout=10.0))
    assert prog[-1] == 1.0
    lab1 = t.get_labels(1)
    assert lab1 is not None and lab1.max() == 2  # two cells labeled
    assert (lab1[img == 255] == 0).all()
    tbl = t.get_cells_info(1)
    assert tbl is not None and int(np.asarray(tbl.area).max()) > 0
    # direct loader also accepts tiff via read_tiff path
    assert load_external_labels(t, 1, str(outdir / "missing.tif")) is None


def test_ome_tiff_roundtrip_and_interop(tmp_path):
    """save_tiff writes OME-XML in the first IFD (reference writes OME-TIFF,
    basic_image_manipulations.py:162-189): exact axes/shape round-trip via the
    JSON annotation, and — the interop contract — axes + physical pixel sizes
    recoverable from the OME Pixels block ALONE (what Fiji/aicsimageio read)."""
    import re

    from tissue_image_processing_tpu.io.tiff import (build_ome_xml,
                                                     parse_ome_xml, save_tiff)

    rng = np.random.default_rng(0)
    arr = (rng.random((3, 2, 6, 8)) * 1000).astype(np.uint16)
    p = str(tmp_path / "proj.tif")
    meta = {"SizeT": 3, "physical_size_z": 1.5, "physical_size_y": 0.1,
            "physical_size_x": 0.1, "note": "tissue"}
    save_tiff(p, arr, metadata=meta, axes="TCYX")

    got, axes, shape, m = read_tiff(p)
    np.testing.assert_array_equal(got, arr)
    assert axes == "TCYX" and tuple(shape) == arr.shape
    assert m["physical_size_x"] == 0.1 and m["note"] == "tissue"

    # the description IS an OME document
    from PIL import Image
    with Image.open(p) as im:
        desc = str(im.tag_v2[270])
    assert desc.lstrip().startswith("<?xml") and "<OME" in desc
    assert 'DimensionOrder="XYCTZ"' in desc or 'DimensionOrder="XYCZT"' in desc

    # OME-core-only parse (annotation stripped): a third-party OME reader's view
    bare = re.sub(r"<StructuredAnnotations>.*</StructuredAnnotations>", "", desc)
    core = parse_ome_xml(bare)
    assert core["physical_size_z"] == 1.5 and core["SizeT"] == 3
    assert int(np.prod(core["shape"])) == arr.size
    # the OME-derived layout maps back to the same TCZYX tensor
    from tissue_image_processing_tpu.io.tiff import to_tczyx
    np.testing.assert_array_equal(
        to_tczyx(got.reshape(core["shape"]), core["axes"]),
        to_tczyx(arr, "TCYX"))

    # build_ome_xml handles placeholder axes (bare page stacks)
    xml = build_ome_xml("QYX", (4, 6, 8), "float32", None)
    q = parse_ome_xml(xml)
    assert q["SizeT"] == 4 and q["axes"] == "QYX"


def test_cli_pipeline_unet(tmp_path):
    """`cli pipeline --unet [--quantize]`: the fused proj->UNet->postprocess->
    track program as a one-command product path (reference GUI U-Net workflow,
    gui.py:1391-1407), streamed in chunks, session populated."""
    from tissue_image_processing_tpu.cli import main
    from tissue_image_processing_tpu.core.tissue import Tissue

    movie = _grid_movie(tmp_path, T=4)
    session = os.path.join(tmp_path, "u.seg")
    args = ["pipeline", movie, "--session", session, "--capacity", "64",
            "--unet", "--unet-depth", "2", "--unet-filters", "8",
            "--unet-batch", "2", "--chunk", "2"]
    assert main(args) == 0
    assert os.path.exists(session)
    tissue = Tissue(4, "check", capacity=64)
    for _ in tissue.load(session):
        pass
    assert tissue.get_labels(1) is not None
    t1 = tissue.get_cells_info(1)
    assert int(np.asarray(t1.valid_mask()).sum()) > 0
    # unchunked run matches the chunked one
    session2 = os.path.join(tmp_path, "u2.seg")
    args2 = ["pipeline", movie, "--session", session2, "--capacity", "64",
             "--unet", "--unet-depth", "2", "--unet-filters", "8",
             "--unet-batch", "2"]
    assert main(args2) == 0
    t2 = Tissue(4, "check2", capacity=64)
    for _ in t2.load(session2):
        pass
    for f in (1, 4):
        np.testing.assert_array_equal(tissue.get_labels(f), t2.get_labels(f))
        np.testing.assert_array_equal(
            np.asarray(tissue.get_cells_info(f).label),
            np.asarray(t2.get_cells_info(f).label))


def test_cli_warmup_unet(tmp_path):
    """`warmup --unet [--quantize]` compiles the exact U-Net pipeline jaxprs
    (whole-movie + chunked variants) so `pipeline --unet` starts warm."""
    from tissue_image_processing_tpu.cli import main

    assert main(["warmup", "--unet", "--frames", "2", "--size", "64",
                 "--zdepth", "2", "--capacity", "64", "--unet-depth", "2",
                 "--unet-filters", "8", "--unet-batch", "2"]) == 0
    assert main(["warmup", "--unet", "--quantize", "--frames", "2", "--size",
                 "64", "--zdepth", "2", "--capacity", "64", "--unet-depth",
                 "2", "--unet-filters", "8", "--unet-batch", "2"]) == 0
