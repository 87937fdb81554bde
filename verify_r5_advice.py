"""Round-5 TPU drive of the ADVICE-fix paths (verify skill recipe).

Exercises on the REAL TPU:
  1. large_image_projection over a LAZY multi-page TIFF (frame-major tiling —
     each frame must decode once, tiles sliced host-side);
  2. cli pipeline on a small movie store, then find_events under a nonzero
     drift (the division neighbor-lookup convention fix);
  3. the sharded-percentile subsample mirror runs on the virtual CPU mesh in
     tests (collectives need 8 devices) — here just the unsharded twin.
"""
import os
import tempfile

import numpy as np

import tissue_image_processing_tpu  # noqa: F401  (package import sanity)


def main():
    tmp = tempfile.mkdtemp(prefix="verify_r5_")

    # --- 1. lazy-store tiled projection --------------------------------------
    from tissue_image_processing_tpu.io.movie import MovieStore, _TiffFrameSource
    from tissue_image_processing_tpu.io.tiff import save_tiff
    from tissue_image_processing_tpu.projection.driver import (
        large_image_projection)

    rng = np.random.default_rng(0)
    movie = (rng.random((2, 1, 4, 64, 64)) * 60000).astype(np.uint16)
    save_tiff(os.path.join(tmp, "fixed.tif"), movie, axes="TCZYX")
    calls = []
    orig = _TiffFrameSource._read_frame
    _TiffFrameSource._read_frame = lambda self, t: (calls.append(t),
                                                    orig(self, t))[1]
    try:
        ok = large_image_projection(tmp, tmp, "fixed.tif", chunk_size=32)
    finally:
        _TiffFrameSource._read_frame = orig
    assert ok == 1 and sorted(calls) == [0, 1], calls
    assert os.path.isfile(os.path.join(tmp, "fixed_projection.tif"))
    print(f"[1] lazy tiled projection: 2x2 tiles, decodes={sorted(calls)} OK",
          flush=True)

    # --- 2. pipeline + events under drift on TPU -----------------------------
    from tests.test_tissue import grid_labels
    from tissue_image_processing_tpu.core.tissue import Tissue

    T, shift = 5, 6
    tissue = Tissue(T, "verify_r5", channel_names=["zo"], capacity=64)
    for f in range(1, T + 1):
        lab = grid_labels()
        if f >= 3:
            ys, _ = np.nonzero(lab == 15)
            mid = (ys.min() + ys.max()) // 2
            rows = np.arange(lab.shape[0])[:, None]
            new = lab.max() + 1
            lab[(lab == 15) & (rows > mid)] = new
            lab[(lab == 15) & (rows == mid)] = 0
        lab = np.roll(lab, (f - 1) * shift, axis=0)
        tissue.set_labels(f, lab)
        tissue.calculate_frame_cellinfo(f)
    tissue.drifts[1:] = (-float(shift), 0.0)
    tissue.find_events()
    divs = tissue.get_events().query('type == "division"')
    assert len(divs) >= 1 and int(divs.iloc[0].cell_id) == 15, divs
    print(f"[2] division under drift on TPU: mother={int(divs.iloc[0].cell_id)}"
          f" daughter={int(divs.iloc[0].daughter_id)} OK", flush=True)

    # --- 3. cli pipeline end-to-end (small, warm-cached shapes) --------------
    from tissue_image_processing_tpu.cli import main as cli_main

    # membrane-like synthetic: bright ridges along Voronoi boundaries
    # (tests/conftest.py:make_cell_image pattern, inlined — importing the
    # conftest would assert the CPU backend)
    from scipy.ndimage import gaussian_filter

    pts = rng.random((60, 2)) * 256
    yy, xx = np.mgrid[0:256, 0:256]
    d = ((yy[..., None] - pts[:, 0]) ** 2
         + (xx[..., None] - pts[:, 1]) ** 2)
    part = np.partition(d, 1, axis=-1)
    ridge = np.sqrt(part[..., 1]) - np.sqrt(part[..., 0])
    img = gaussian_filter((ridge < 2.0).astype(np.float32), 1.0)
    mv = np.broadcast_to((img / max(img.max(), 1e-6) * 60000)
                         .astype(np.uint16), (4, 1, 1, 256, 256)).copy()
    np.save(os.path.join(tmp, "mv.npy"), mv)
    seg = os.path.join(tmp, "out.seg")
    cli_main(["pipeline", os.path.join(tmp, "mv.npy"), "--session", seg])
    assert os.path.isfile(seg)
    print("[3] cli pipeline OK", flush=True)
    print("VERIFY r5 ADVICE: ALL OK", flush=True)


if __name__ == "__main__":
    main()
