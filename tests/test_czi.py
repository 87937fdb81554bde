"""Native CZI reader (io/czi.py) vs a synthetic ZISRAW writer.

The writer below emits the same container layout Zeiss ZEN writes (32-byte
aligned segments, DV directory entries, 256-byte-min subblock headers), so the
round trip validates the parser against the format spec rather than against
itself.
"""
import os
import struct

import numpy as np
import pytest

from tissue_image_processing_tpu.io.czi import CziFile, czi_to_store, read_czi

_PT = {np.dtype("uint8"): 0, np.dtype("uint16"): 1, np.dtype("float32"): 2}


def _segment(sid: bytes, payload: bytes, min_alloc: int = 0) -> bytes:
    used = len(payload)
    alloc = max(used, min_alloc)
    alloc += (-alloc) % 32
    hdr = sid.ljust(16, b"\x00") + struct.pack("<qq", alloc, used)
    return hdr + payload.ljust(alloc, b"\x00")


def _entry_dv(pixel_type, file_pos, dims, compression=0) -> bytes:
    out = b"DV" + struct.pack("<i", pixel_type) + struct.pack("<q", file_pos)
    out += struct.pack("<i", 0)            # FilePart
    out += struct.pack("<i", compression)  # Compression
    out += b"\x00" * 6                     # PyramidType + reserved
    out += struct.pack("<i", len(dims))
    for name, (start, size) in dims.items():
        out += name.encode().ljust(4, b"\x00")
        out += struct.pack("<ii", start, size)
        out += struct.pack("<f", float(start))   # StartCoordinate
        out += struct.pack("<i", size)           # StoredSize
    return out


def _compressed_payload(px, compression, hilo=False):
    """zstd0 (5): a bare zstd stream. zstd1 (6): [header size][chunk id 1]
    [hi-lo flag] + zstd stream; with hi-lo packing the 16-bit samples split
    into all-low-bytes-then-all-high-bytes before compression."""
    import zstandard

    data = px.tobytes()
    if compression == 5:
        return zstandard.ZstdCompressor().compress(data)
    assert compression == 6
    if hilo:
        b = np.frombuffer(data, np.uint8)
        packed = np.concatenate([b[0::2], b[1::2]]).tobytes()
        return bytes([3, 1, 1]) + zstandard.ZstdCompressor().compress(packed)
    return bytes([1]) + zstandard.ZstdCompressor().compress(data)


def write_czi(path, planes, compression=0, hilo=False):
    """planes: list of (dims dict, 2-D ndarray). Emits subblocks + directory +
    metadata + file header in ZISRAW layout."""
    body = b""
    positions = []
    # file header segment (32-byte header + 512-byte payload) sits at offset 0
    base = 32 + 512
    entries = []
    for dims, px in planes:
        pt = _PT[px.dtype]
        entry = _entry_dv(pt, 0, dims, compression=compression)
        data = (px.tobytes() if compression == 0
                else _compressed_payload(px, compression, hilo))
        hdr = struct.pack("<ii", 0, 0) + struct.pack("<q", len(data))
        pad = max(256, 16 + len(entry)) - 16 - len(entry)
        payload = hdr + entry + b"\x00" * pad + data
        positions.append(base + len(body))
        entries.append((pt, dims))
        body += _segment(b"ZISRAWSUBBLOCK", payload)
    # directory
    dir_pos = base + len(body)
    dir_payload = struct.pack("<i", len(entries)) + b"\x00" * 124
    for (pt, dims), pos in zip(entries, positions):
        dir_payload += _entry_dv(pt, pos, dims, compression=compression)
    body += _segment(b"ZISRAWDIRECTORY", dir_payload)
    # metadata
    meta_pos = base + len(body)
    xml = b"<ImageDocument><Metadata/></ImageDocument>"
    meta_payload = struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml
    body += _segment(b"ZISRAWMETADATA", meta_payload)
    # file header
    fh = struct.pack("<iiii", 1, 0, 0, 0) + b"\x00" * 32 + struct.pack("<i", 0)
    fh += struct.pack("<q", dir_pos) + struct.pack("<q", meta_pos)
    fh += struct.pack("<i", 0) + struct.pack("<q", 0)
    fh = fh.ljust(512, b"\x00")
    with open(path, "wb") as f:
        f.write(_segment(b"ZISRAWFILE", fh, min_alloc=512))
        assert f.tell() == base
        f.write(body)


def make_movie_planes(T=2, C=2, Z=3, Y=24, X=32, seed=0, dtype=np.uint16):
    rng = np.random.default_rng(seed)
    planes = []
    vol = rng.integers(0, 60000, (T, C, Z, Y, X)).astype(dtype)
    for t in range(T):
        for c in range(C):
            for z in range(Z):
                dims = {"X": (0, X), "Y": (0, Y), "C": (c, 1), "Z": (z, 1),
                        "T": (t, 1)}
                planes.append((dims, vol[t, c, z]))
    return planes, vol


def test_czi_roundtrip_tczyx(tmp_path):
    path = os.path.join(str(tmp_path), "movie.czi")
    planes, vol = make_movie_planes()
    write_czi(path, planes)
    got = read_czi(path)
    np.testing.assert_array_equal(got, vol)
    with CziFile.open(path) as f:
        assert f.shape_tczyx() == vol.shape
        assert "ImageDocument" in f.metadata_xml
        # lazy single-plane read
        np.testing.assert_array_equal(f.read_frame(1, 0, 2), vol[1, 0, 2])


def test_czi_mosaic_tiles(tmp_path):
    """Tiles at X/Y offsets assemble into one plane."""
    path = os.path.join(str(tmp_path), "mosaic.czi")
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    b = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    planes = [({"X": (0, 16), "Y": (0, 16), "T": (0, 1)}, a),
              ({"X": (16, 16), "Y": (0, 16), "T": (0, 1)}, b)]
    write_czi(path, planes)
    with CziFile.open(path) as f:
        plane = f.read_frame(0)
        assert plane.shape == (16, 32)
        np.testing.assert_array_equal(plane[:, :16], a)
        np.testing.assert_array_equal(plane[:, 16:], b)


def test_czi_mosaic_global_stage_offset(tmp_path):
    """Mosaics acquired at a non-zero global stage offset (raw X/Y starts far
    from 0) normalize to origin instead of allocating oversized output."""
    path = os.path.join(str(tmp_path), "mosaic_off.czi")
    rng = np.random.default_rng(4)
    a = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    b = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    planes = [({"X": (5000, 16), "Y": (7000, 16), "T": (0, 1)}, a),
              ({"X": (5016, 16), "Y": (7000, 16), "T": (0, 1)}, b)]
    write_czi(path, planes)
    with CziFile.open(path) as f:
        assert f.shape_tczyx()[-2:] == (16, 32)
        plane = f.read_frame(0)
        np.testing.assert_array_equal(plane[:, :16], a)
        np.testing.assert_array_equal(plane[:, 16:], b)


def test_czi_sparse_acquisition_tolerated(tmp_path):
    """read_whole leaves missing planes zero instead of failing the whole read
    (truncated / sparsely-acquired files)."""
    path = os.path.join(str(tmp_path), "sparse.czi")
    rng = np.random.default_rng(5)
    p0 = rng.integers(0, 999, (8, 8)).astype(np.uint16)
    p2 = rng.integers(0, 999, (8, 8)).astype(np.uint16)
    # planes for T=0 and T=2 only; T=1 missing
    planes = [({"X": (0, 8), "Y": (0, 8), "T": (0, 1)}, p0),
              ({"X": (0, 8), "Y": (0, 8), "T": (2, 1)}, p2)]
    write_czi(path, planes)
    got = read_czi(path)
    assert got.shape == (3, 1, 1, 8, 8)
    np.testing.assert_array_equal(got[0, 0, 0], p0)
    np.testing.assert_array_equal(got[1, 0, 0], np.zeros((8, 8), np.uint16))
    np.testing.assert_array_equal(got[2, 0, 0], p2)


def test_czi_jpegxr_rejected_with_conversion_path(tmp_path):
    path = os.path.join(str(tmp_path), "c.czi")
    px = np.zeros((8, 8), np.uint16)
    planes = [({"X": (0, 8), "Y": (0, 8)}, px)]
    write_czi(path, planes)
    with CziFile.open(path) as f:
        f.subblocks[0].compression = 4  # JpegXrFile — no codec available
        with pytest.raises(ValueError, match="JPEG-XR.*MIGRATION"):
            f._subblock_pixels(f.subblocks[0])


@pytest.mark.parametrize("compression,hilo", [(5, False), (6, False), (6, True)])
def test_czi_zstd_roundtrip(tmp_path, compression, hilo):
    """zstd0 / zstd1 (with and without hi-lo byte packing) decode to the same
    TCZYX array as an uncompressed write — ZEN's default codecs since 2019."""
    path = os.path.join(str(tmp_path), f"z{compression}{int(hilo)}.czi")
    planes, vol = make_movie_planes(T=2, C=1, Z=2, Y=24, X=32, seed=7)
    write_czi(path, planes, compression=compression, hilo=hilo)
    got = read_czi(path)
    np.testing.assert_array_equal(got, vol)
    with CziFile.open(path) as f:
        assert f.subblocks[0].compression == compression
        np.testing.assert_array_equal(f.read_frame(1, 0, 1), vol[1, 0, 1])


def test_czi_zstd_gray8_and_float(tmp_path):
    """zstd roundtrip for the non-16-bit pixel types (no hi-lo packing)."""
    for dtype, comp in [(np.uint8, 5), (np.float32, 6)]:
        path = os.path.join(str(tmp_path), f"z_{np.dtype(dtype).name}.czi")
        rng = np.random.default_rng(11)
        px = (rng.random((16, 16)) * 200).astype(dtype)
        write_czi(path, [({"X": (0, 16), "Y": (0, 16)}, px)], compression=comp)
        got = read_czi(path)
        np.testing.assert_array_equal(got[0, 0, 0], px)


def test_czi_zstd_lazy_store_streams(tmp_path):
    """A zstd-compressed CZI streams through the lazy MovieStore: only the
    touched frame's subblocks decode."""
    from tissue_image_processing_tpu.io.movie import MovieStore, _CziFrameSource

    path = os.path.join(str(tmp_path), "lazy_z.czi")
    planes, vol = make_movie_planes(T=3, C=2, Z=2, Y=16, X=16, seed=9)
    write_czi(path, planes, compression=6, hilo=True)
    store = MovieStore.open(path)
    assert isinstance(store.data, _CziFrameSource)
    np.testing.assert_array_equal(store.frame(2), vol[2])
    np.testing.assert_array_equal(np.asarray(store.data), vol)
    store.close()


def test_czi_zstd1_corrupt_header(tmp_path):
    from tissue_image_processing_tpu.io.czi import _zstd_decode

    with pytest.raises(ValueError, match="empty zstd1"):
        _zstd_decode(b"", 8, 2, zstd1=True)
    with pytest.raises(ValueError, match="corrupt zstd1"):
        _zstd_decode(bytes([200, 1, 1]), 8, 2, zstd1=True)
    with pytest.raises(ValueError, match="unknown zstd1"):
        _zstd_decode(bytes([3, 7, 0]) + b"x", 8, 2, zstd1=True)
    import zstandard

    stream = zstandard.ZstdCompressor().compress(b"\x00" * 8)
    with pytest.raises(ValueError, match="only defined for 16-bit"):
        _zstd_decode(bytes([3, 1, 1]) + stream, 8, 4, zstd1=True)


def test_czi_series_to_store(tmp_path):
    p1 = os.path.join(str(tmp_path), "m1.czi")
    p2 = os.path.join(str(tmp_path), "m2.czi")
    planes1, vol1 = make_movie_planes(T=2, Z=2, Y=16, X=16, seed=1)
    planes2, vol2 = make_movie_planes(T=1, Z=2, Y=12, X=16, seed=2)
    write_czi(p1, planes1)
    write_czi(p2, planes2)
    out = os.path.join(str(tmp_path), "store.npy")
    store = czi_to_store([p1, p2], out)
    assert store.shape == (3, 2, 2, 16, 16)
    np.testing.assert_array_equal(store.frame(0), vol1[0])
    # the smaller file is zero-padded to the max XY
    f2 = store.frame(2)
    np.testing.assert_array_equal(f2[:, :, :12, :], vol2[0])
    assert (f2[:, :, 12:, :] == 0).all()
    # reopen through MovieStore.open
    from tissue_image_processing_tpu.io.movie import MovieStore
    re = MovieStore.open(out)
    assert re.num_frames == 3
