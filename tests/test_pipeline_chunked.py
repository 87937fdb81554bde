"""T-chunked streaming pipeline: chunked == unchunked, bounded memory.

The reference streams any-length movies per frame (dask ``.compute()``,
``basic_image_manipulations.py:59-62,89-159``, ``gui.py:442-444``); the TPU
build streams in HBM-sized T-chunks with explicit carries (tracking scan
state, boundary drift, adaptive-radius point set). These tests pin the carry
design: splitting the movie at ANY chunk size must reproduce the whole-movie
program's track ids, drifts and labels.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tissue_image_processing_tpu.core.pipeline import (movie_pipeline,
                                                       movie_pipeline_chunked)


def _movie(T=7, C=2, Z=4, H=64, W=64, seed=0):
    """Drifting synthetic membrane movie (same recipe as bench.make_movie,
    small)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    n_cells = 24
    pts = np.stack([rng.uniform(0, H, n_cells), rng.uniform(0, W, n_cells)], 1)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = (Z / 2 + (Z / 4) * np.sin(yy / 31.0) * np.cos(xx / 47.0)).astype(
        np.float32)
    zz = np.arange(Z, dtype=np.float32).reshape(Z, 1, 1)
    zprof = np.exp(-((zz - depth) ** 2) / 2.0)
    frames = np.empty((T, C, Z, H, W), np.float32)
    for t in range(T):
        p = pts + t * np.array([1.0, -0.7]) + rng.normal(0, 0.1, pts.shape)
        d, _ = cKDTree(p).query(np.stack([yy.ravel(), xx.ravel()], 1), k=2)
        ridge = np.exp(-((d[:, 1] - d[:, 0]) ** 2) / 8.0).reshape(H, W)
        frames[t, 0] = ridge[None] * zprof * 50000 + rng.normal(0, 200, (Z, H, W))
        for c in range(1, C):
            frames[t, c] = (1 - ridge)[None] * zprof * 20000
    return np.clip(frames, 0, 65535).astype(np.float32)


@pytest.fixture(scope="module")
def movie():
    return _movie()


@pytest.fixture(scope="module")
def whole(movie):
    return movie_pipeline(jnp.asarray(movie), capacity=64, block_size=31,
                          batch=1)


@pytest.mark.parametrize("chunk", [3, 4, 7])
def test_chunked_matches_whole_movie(movie, whole, chunk):
    """Track ids (the cross-chunk carry), drifts (boundary pairs) and labels
    (per-frame work) must be identical for every chunking, including a
    non-dividing chunk (3 -> padded tail) and chunk == T."""
    got = movie_pipeline_chunked(movie, chunk_frames=chunk, capacity=64,
                                 block_size=31, batch=1)
    np.testing.assert_array_equal(got["ids"], whole["ids"])
    np.testing.assert_allclose(got["drifts"], np.asarray(whole["drifts"]),
                               atol=1e-4)
    np.testing.assert_array_equal(got["labels"], np.asarray(whole["labels"]))
    np.testing.assert_array_equal(np.asarray(got["tables"].area),
                                  np.asarray(whole["tables"].area))


def test_on_chunk_streams_and_bounds_memory(movie, whole):
    """on_chunk delivers every real frame exactly once in order; with
    keep_labels=False the result dict carries no label stack (the caller
    persisted them)."""
    seen = []

    def sink(t0, chunk_out):
        seen.append((t0, chunk_out["labels"].shape[0]))

    got = movie_pipeline_chunked(movie, chunk_frames=4, capacity=64,
                                 block_size=31, batch=1, on_chunk=sink,
                                 keep_labels=False)
    assert seen == [(0, 4), (4, 3)]
    assert got["labels"] is None
    np.testing.assert_array_equal(got["ids"], whole["ids"])


def test_chunked_from_mmap_store(tmp_path, movie, whole):
    """The product entry: a MovieStore-backed .npy memmap streams through the
    chunked pipeline without materializing the whole movie."""
    from tissue_image_processing_tpu.io.movie import MovieStore

    p = str(tmp_path / "movie.npy")
    store = MovieStore.create(p, movie.shape, dtype=np.float32)
    for t in range(movie.shape[0]):
        store.write_frame(t, movie[t])
    store.data.flush()
    ro = MovieStore.open(p)
    got = movie_pipeline_chunked(ro, chunk_frames=4, capacity=64,
                                 block_size=31, batch=1)
    np.testing.assert_array_equal(got["ids"], whole["ids"])


def test_chunked_pipeline_from_lazy_tiff_store(tmp_path):
    """The chunked driver must consume a LAZY TIFF MovieStore (per-page
    decode) and reproduce the in-memory array run exactly."""
    from tissue_image_processing_tpu.io.movie import MovieStore, _TiffFrameSource
    from tissue_image_processing_tpu.io.tiff import save_tiff

    movie = _movie(T=5).astype(np.uint16)
    path = str(tmp_path / "movie.tif")
    save_tiff(path, movie, axes="TCZYX")
    store = MovieStore.open(path)
    assert isinstance(store.data, _TiffFrameSource)
    kw = dict(capacity=128, batch=1, search_range=30.0)
    got = movie_pipeline_chunked(store, chunk_frames=2, **kw)
    want = movie_pipeline(jnp.asarray(movie), **kw)
    np.testing.assert_array_equal(got["ids"], want["ids"])
    np.testing.assert_array_equal(got["labels"], want["labels"])
    store.close()


@pytest.fixture(scope="module")
def unet_cfg():
    """Small randomly-initialized U-Net packaged for the fused pipeline."""
    from tissue_image_processing_tpu.models.predictor import (
        SegmentationPredictor)

    pred = SegmentationPredictor(None, (2, 64, 64), depth=3, base_filters=8)
    return pred.pipeline_config(batch=2)


@pytest.mark.parametrize("chunk", [3, 4])
def test_unet_chunked_matches_whole_movie(movie, unet_cfg, chunk):
    """The U-Net program under T-chunked streaming reproduces the whole-movie
    run exactly — ids (tracking carry), labels, drifts (boundary carry)."""
    kw = dict(capacity=64, unet=unet_cfg)
    want = movie_pipeline(jnp.asarray(movie), **kw)
    got = movie_pipeline_chunked(movie, chunk_frames=chunk, **kw)
    np.testing.assert_array_equal(got["ids"], want["ids"])
    np.testing.assert_array_equal(got["labels"], np.asarray(want["labels"]))
    np.testing.assert_allclose(got["drifts"], np.asarray(want["drifts"]),
                               atol=1e-4)


def test_unet_chunked_channel_select(movie, unet_cfg):
    """channels= selects the model's (atoh, zo) pair from a wider store on
    the host chunk (lazy stores never materialize)."""
    wide = np.concatenate([np.zeros_like(movie[:, :1]), movie], axis=1)
    got = movie_pipeline_chunked(wide, chunk_frames=4, capacity=64,
                                 unet=unet_cfg, channels=(1, 2))
    want = movie_pipeline(jnp.asarray(movie), capacity=64, unet=unet_cfg)
    np.testing.assert_array_equal(got["ids"], want["ids"])


def test_unet_quantized_pipeline_runs(movie):
    """The int8 variant of the fused U-Net program runs end-to-end (label
    parity vs bf16 is certified at production scale in tests/test_unet.py +
    bench's dice_int8_vs_bf16)."""
    from tissue_image_processing_tpu.models.predictor import (
        SegmentationPredictor)
    from tissue_image_processing_tpu.projection.surface import (
        project_timepoint_auto)

    pred = SegmentationPredictor(None, (2, 64, 64), depth=3, base_filters=8,
                                 quantize=True)
    if not pred.quantize:
        pytest.skip("random init blocked the BN fold")
    prj0 = project_timepoint_auto(jnp.asarray(movie[0]), reference_channel=0)[0]
    pred.calibrate(np.asarray(prj0))
    cfg = pred.pipeline_config(batch=2)
    assert cfg["quantized"]
    out = movie_pipeline_chunked(movie, chunk_frames=4, capacity=64, unet=cfg)
    assert out["ids"].shape == (movie.shape[0], 64)
    assert out["labels"].shape[0] == movie.shape[0]


def test_unet_chunked_from_lazy_zstd_czi(tmp_path, unet_cfg):
    """Round-5 feature composition: a zstd1-compressed CZI streams through
    the lazy MovieStore into the chunked U-Net pipeline and reproduces the
    in-memory array run exactly."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_czi import write_czi

    from tissue_image_processing_tpu.io.movie import (MovieStore,
                                                      _CziFrameSource)

    movie = _movie(T=4).astype(np.uint16)
    T, C, Z, Y, X = movie.shape
    planes = []
    for t in range(T):
        for c in range(C):
            for z in range(Z):
                planes.append(({"X": (0, X), "Y": (0, Y), "C": (c, 1),
                                "Z": (z, 1), "T": (t, 1)}, movie[t, c, z]))
    path = str(tmp_path / "movie.czi")
    write_czi(path, planes, compression=6, hilo=True)
    store = MovieStore.open(path)
    assert isinstance(store.data, _CziFrameSource)
    kw = dict(capacity=64, unet=unet_cfg)
    got = movie_pipeline_chunked(store, chunk_frames=2, **kw)
    want = movie_pipeline(jnp.asarray(movie), **kw)
    np.testing.assert_array_equal(got["ids"], want["ids"])
    np.testing.assert_array_equal(got["labels"], np.asarray(want["labels"]))
    store.close()
