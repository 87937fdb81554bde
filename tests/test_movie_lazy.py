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


def test_bool_mask_selects_frames(tmp_path):
    path, movie = _tiff_movie(tmp_path)
    store = MovieStore.open(path)
    sel = np.array([True, False, True])
    np.testing.assert_array_equal(store.data[sel], movie[sel])
    store.close()


def test_foreign_ome_series_member_falls_back_to_pages(tmp_path):
    """A multi-file OME series member declares the WHOLE series' Size* in its
    XML (Bio-Formats convention); both readers must fall back to pages-as-T
    instead of reshaping to the foreign shape."""
    from PIL import Image
    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    from tissue_image_processing_tpu.io.tiff import build_ome_xml, read_tiff

    rng = np.random.default_rng(2)
    pages = (rng.random((2, 6, 8)) * 255).astype(np.uint8)
    path = str(tmp_path / "series_member.tif")
    ifd = ImageFileDirectory_v2()
    # XML says SizeT=4 but this file holds 2 pages
    ifd[270] = build_ome_xml("TYX", (4, 6, 8), "uint8").encode("utf-8")
    frames = [Image.fromarray(p) for p in pages]
    frames[0].save(path, save_all=True, append_images=frames[1:], tiffinfo=ifd)
    arr, axes, shape, _ = read_tiff(path)
    assert axes == "QYX" and arr.shape == (2, 6, 8)
    np.testing.assert_array_equal(arr, pages)
    store = MovieStore.open(path)
    assert store.shape == (2, 1, 1, 6, 8)
    np.testing.assert_array_equal(store.frames(0, 2)[:, 0, 0], pages)
    store.close()


def test_bare_pages_eager_open(tmp_path):
    """lazy=False on a metadata-less multi-page TIFF (axes 'QYX') must open
    too — to_tczyx maps the placeholder axis onto T."""
    from PIL import Image

    movie = (np.random.default_rng(3).random((4, 10, 12)) * 255).astype(np.uint8)
    path = str(tmp_path / "bare2.tif")
    frames = [Image.fromarray(p) for p in movie]
    frames[0].save(path, save_all=True, append_images=frames[1:])
    eager = MovieStore.open(path, lazy=False)
    assert eager.shape == (4, 1, 1, 10, 12)
    np.testing.assert_array_equal(np.asarray(eager.data)[:, 0, 0], movie)


def test_too_many_axes_raises(tmp_path):
    arr = np.zeros((2, 2, 2, 2, 4, 6), np.uint8)  # 6-D: QQQQYX
    path = str(tmp_path / "six_d.tif")
    save_tiff(path, arr)
    import pytest

    with pytest.raises(ValueError, match="TCZYX"):
        MovieStore.open(path)


def test_ome_micron_unit_survives(tmp_path):
    """PhysicalSize*Unit must round-trip as real UTF-8 'µm' — PIL's ASCII tag
    encoding used to mangle it to '?m' (an invalid OME UnitsLength)."""
    from tissue_image_processing_tpu.io.tiff import read_tiff

    path = str(tmp_path / "phys.tif")
    save_tiff(path, np.zeros((2, 8, 8), np.uint16), axes="ZYX",
              metadata={"physical_size_x": 0.1, "physical_size_z": 0.5})
    raw = open(path, "rb").read()
    assert "µm".encode("utf-8") in raw and b"?m" not in raw
    _, _, _, meta = read_tiff(path)
    assert meta["physical_size_x"] == 0.1 and meta["physical_size_z"] == 0.5


def test_large_image_projection_decodes_each_frame_once(tmp_path, monkeypatch):
    """The XY tile loop must not re-decode a lazy store per tile: slicing
    store.data[..., y0:, x0:] decodes ALL frames at full resolution for every
    tile. The driver decodes each frame once and tiles the host array."""
    from tissue_image_processing_tpu.projection.driver import (
        large_image_projection)

    path, movie = _tiff_movie(tmp_path, T=2, C=1, Z=3, Y=32, X=32)
    calls = []
    orig = _TiffFrameSource._read_frame

    def counting(self, t):
        calls.append(t)
        return orig(self, t)

    monkeypatch.setattr(_TiffFrameSource, "_read_frame", counting)
    out = str(tmp_path / "out")
    import os

    os.makedirs(out, exist_ok=True)
    assert large_image_projection(str(tmp_path), out, "movie.tif",
                                  chunk_size=16) == 1
    # 2x2 tiles per frame, 2 frames: exactly one decode per frame
    assert sorted(calls) == [0, 1], calls
    proj = str(tmp_path / "out" / "movie_projection.tif")
    assert os.path.isfile(proj)
