"""Lazy TIFF/CZI MovieStore: opening never materializes the movie.

The reference's out-of-core story is dask-lazy reads computed per frame
(``read_virtual_image``, ``basic_image_manipulations.py:59-62``); here every
container streams — .npy via mmap, TIFF via per-page PIL decode, CZI via
per-subblock reads — and the lazy view must index-match the eager decode.
"""

import numpy as np

from tissue_image_processing_tpu.io.movie import (MovieStore, _CziFrameSource,
                                                  _TiffFrameSource)
from tissue_image_processing_tpu.io.tiff import save_tiff

from test_czi import make_movie_planes, write_czi


def _tiff_movie(tmp_path, T=3, C=2, Z=4, Y=16, X=24, seed=0):
    rng = np.random.default_rng(seed)
    movie = (rng.random((T, C, Z, Y, X)) * 60000).astype(np.uint16)
    path = str(tmp_path / "movie.tif")
    save_tiff(path, movie, axes="TCZYX")
    return path, movie


def test_tiff_store_is_lazy_and_matches_eager(tmp_path):
    path, movie = _tiff_movie(tmp_path)
    store = MovieStore.open(path)
    assert isinstance(store.data, _TiffFrameSource)
    assert store.shape == movie.shape and store.num_frames == movie.shape[0]
    np.testing.assert_array_equal(store.frame(1), movie[1])
    np.testing.assert_array_equal(store.frames(1, 3), movie[1:3])
    # the drivers' fancy access patterns
    np.testing.assert_array_equal(store.data[:, 1, 0], movie[:, 1, 0])
    np.testing.assert_array_equal(store.data[-1], movie[-1])
    np.testing.assert_array_equal(np.asarray(store.data), movie)
    eager = MovieStore.open(path, lazy=False)
    np.testing.assert_array_equal(np.asarray(eager.data), movie)
    store.close()


def test_tiff_store_bare_pages_default_to_t(tmp_path):
    """A TIFF with no axes metadata streams pages as T."""
    from PIL import Image

    rng = np.random.default_rng(1)
    movie = (rng.random((4, 10, 12)) * 255).astype(np.uint8)
    path = str(tmp_path / "bare.tif")
    frames = [Image.fromarray(p) for p in movie]
    frames[0].save(path, save_all=True, append_images=frames[1:])
    store = MovieStore.open(path)
    assert isinstance(store.data, _TiffFrameSource)
    assert store.shape == (4, 1, 1, 10, 12)
    np.testing.assert_array_equal(store.frames(0, 4)[:, 0, 0], movie)
    store.close()


def test_czi_store_is_lazy_and_matches_eager(tmp_path):
    planes, movie = make_movie_planes(T=2, C=2, Z=3)
    path = str(tmp_path / "movie.czi")
    write_czi(path, planes)
    store = MovieStore.open(path)
    assert isinstance(store.data, _CziFrameSource)
    np.testing.assert_array_equal(np.asarray(store.data), movie)
    np.testing.assert_array_equal(store.frame(1), movie[1])
    np.testing.assert_array_equal(store.data[:, 0, 2], movie[:, 0, 2])
    store.close()
