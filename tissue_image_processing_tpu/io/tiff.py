"""TIFF read/write on PIL with 5-D (TCZYX) axis handling.

Mirrors the reference's reader/writer API surface (``read_tiff``/``save_tiff``,
``basic_image_manipulations.py:28-51,162-189``): multi-page TIFFs are (de)serialized
page-major in axis order, with an ImageJ-style description recording the axes so
round-trips preserve shape. uint8/uint16/float32 supported.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image
    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

_DESC_TAG = 270

UINT8_MAXVAL = 255
UINT16_MAXVAL = 65535


def _require_pil():
    if not _HAVE_PIL:
        raise RuntimeError("PIL is required for TIFF I/O")


def read_tiff(path: str):
    """Read a (multi-page) TIFF.

    Returns (image, axes, shape, metadata) like the reference ``read_tiff``
    (``basic_image_manipulations.py:28-51``). Axes are recovered from the
    description JSON written by :func:`save_tiff`; otherwise pages are returned
    as a leading axis ('QYX' for multipage, 'YX' for single page).
    """
    _require_pil()
    with Image.open(path) as im:
        pages = []
        meta = {}
        try:
            desc = im.tag_v2.get(_DESC_TAG) if hasattr(im, "tag_v2") else None
            if desc:
                meta = json.loads(desc)
        except Exception:
            meta = {}
        n = getattr(im, "n_frames", 1)
        for i in range(n):
            im.seek(i)
            pages.append(np.array(im))
    arr = np.stack(pages, axis=0) if len(pages) > 1 else pages[0][None]
    axes = meta.get("axes")
    shape = meta.get("shape")
    if axes and shape:
        arr = arr.reshape(tuple(shape))
    elif arr.shape[0] == 1:
        arr = arr[0]
        axes = "YX"
    else:
        axes = "QYX"
    return arr, axes, arr.shape, meta


def save_tiff(path: str, image: np.ndarray, metadata: Optional[dict] = None,
              axes: str = "", data_type: str = "") -> None:
    """Save an N-D array as a multi-page TIFF (reference ``save_tiff``,
    ``basic_image_manipulations.py:162-189``): optional rescale to uint8/uint16
    (divide by max, scale to dtype range)."""
    _require_pil()
    image = np.asarray(image)
    if data_type and str(image.dtype) != data_type and data_type in ("uint8", "uint16"):
        max_val = UINT8_MAXVAL if data_type == "uint8" else UINT16_MAXVAL
        denom = image.max() if image.max() > 0 else 1
        image = np.round(image / denom * max_val).astype(data_type)
    if image.dtype == np.float64:
        image = image.astype(np.float32)
    desc = dict(metadata or {})
    desc["axes"] = axes or "Q" * (image.ndim - 2) + "YX"
    desc["shape"] = list(image.shape)
    pages_arr = image.reshape((-1,) + image.shape[-2:])
    frames = [Image.fromarray(p) for p in pages_arr]
    ifd = ImageFileDirectory_v2()
    ifd[_DESC_TAG] = json.dumps(desc)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   tiffinfo=ifd, compression=None)


def read_whole_image(path: str):
    """Read any supported container into a TCZYX numpy array + axes string
    (reference ``read_whole_image``, ``basic_image_manipulations.py:54-57``)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".npy",):
        arr = np.load(path)
        return arr, _default_axes(arr.ndim), arr.shape
    if ext in (".tif", ".tiff"):
        arr, axes, shape, _ = read_tiff(path)
        return arr, axes, shape
    if ext == ".czi":
        from tissue_image_processing_tpu.io.czi import CziFile

        with CziFile.open(path) as f:
            arr = f.read_whole()
        return arr, "TCZYX", arr.shape
    raise ValueError(f"unsupported image container: {path}")


def _default_axes(ndim: int) -> str:
    return {2: "YX", 3: "TYX", 4: "TCYX", 5: "TCZYX"}.get(ndim, "Q" * (ndim - 2) + "YX")


def get_image_dimensions(path: str):
    """Shape probe (reference ``get_image_dimensions``,
    ``basic_image_manipulations.py:79-82``). Returns an object with T/C/Z/Y/X."""
    arr, axes, shape = read_whole_image(path)

    class Dims:
        pass

    d = Dims()
    for name in "TCZYX":
        idx = axes.find(name)
        setattr(d, name, shape[idx] if idx >= 0 else 1)
    d.shape = shape
    d.axes = axes
    return d


def to_tczyx(image: np.ndarray, axes: str) -> np.ndarray:
    """Normalize an array to the 5-D TCZYX layout used across the pipeline
    (the reference's movie contract, ``gui.py:442-444``)."""
    order = "TCZYX"
    arr = image
    current = list(axes)
    for name in order:
        if name not in current:
            arr = arr[None]
            current.insert(0, name)
    perm = [current.index(name) for name in order]
    return np.transpose(arr, perm)
