"""Round-5 production-envelope receipt: a >HBM movie end-to-end through
``cli pipeline --unet --quantize`` (VERDICT r4 item 2 'Done' criterion).

Builds a ~19.7 GiB uint16 movie (160 frames x 2ch x 30z x 1024^2 — larger
than the 16 GB v5e HBM) as an mmap-backed MovieStore on disk, then runs the
one-command U-Net product path, which must auto-chunk, stream, and populate
the session. Synthetic membranes drift like bench.make_movie so tracking has
real content. Run: ``python verify_r5_envelope_unet.py [--frames 160]``.
"""
import argparse
import os
import sys
import time

import numpy as np


def build_movie(path, T, Z=30, H=1024, W=1024, seed=0):
    from scipy.spatial import cKDTree

    from tissue_image_processing_tpu.io.movie import MovieStore

    rng = np.random.default_rng(seed)
    n_cells = max((H * W) // 1800, 16)
    pts = np.stack([rng.uniform(0, H, n_cells), rng.uniform(0, W, n_cells)], 1)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = (Z / 2 + (Z / 4) * np.sin(yy / 301.0) * np.cos(xx / 407.0))
    zz = np.arange(Z, dtype=np.float32).reshape(Z, 1, 1)
    zprofile = np.exp(-((zz - depth.astype(np.float32)) ** 2) / 2.0)
    store = MovieStore.create(path, (T, 2, Z, H, W), dtype=np.uint16)
    grid = np.stack([yy.ravel(), xx.ravel()], 1)
    for t in range(T):
        p = pts + t * np.array([1.5, -1.0]) + rng.normal(0, 0.2, pts.shape)
        d, _ = cKDTree(p).query(grid, k=2)
        ridge = np.exp(-((d[:, 1] - d[:, 0]) ** 2) / 8.0).reshape(H, W)
        fr = np.empty((2, Z, H, W), np.uint16)
        fr[0] = np.clip(ridge[None] * zprofile * 50000, 0, 65535)
        fr[1] = np.clip((1 - ridge)[None] * zprofile * 20000, 0, 65535)
        store.write_frame(t, fr)
        if t % 20 == 0:
            print(f"  built frame {t}/{T}", flush=True)
    store.data.flush()
    return store


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--dir", default="/root/repo/session_scratch/envelope_r5")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()
    os.makedirs(args.dir, exist_ok=True)
    movie_path = os.path.join(args.dir, "movie.npy")
    gib = args.frames * 2 * 30 * 1024 * 1024 * 2 / 2 ** 30
    if not os.path.isfile(movie_path):
        print(f"building {gib:.1f} GiB movie ({args.frames} frames)...",
              flush=True)
        t0 = time.time()
        build_movie(movie_path, args.frames)
        print(f"built in {time.time() - t0:.0f}s", flush=True)
    session = os.path.join(args.dir, "envelope.seg")
    from tissue_image_processing_tpu.cli import main as cli_main

    t0 = time.time()
    rc = cli_main(["pipeline", movie_path, "--session", session, "--unet",
                   "--quantize"])
    dt = time.time() - t0
    assert rc == 0 and os.path.isfile(session)
    print(f"ENVELOPE RECEIPT: {gib:.1f} GiB movie ({args.frames} frames, "
          f"> 16 GB HBM) through `cli pipeline --unet --quantize` in "
          f"{dt:.0f}s ({args.frames / dt:.2f} fps wall incl. host staging)",
          flush=True)
    if not args.keep:
        os.remove(movie_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
