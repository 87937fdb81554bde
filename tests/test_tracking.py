import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from tissue_image_processing_tpu.core.tracking import (
    auction_assignment, link_frames, track_movie, TrackingState,
    compute_drift_chain, local_drift_field)
from tissue_image_processing_tpu.core.cell_table import frame_cellinfo, CellTable


def test_auction_matches_hungarian(rng):
    for trial in range(5):
        M, K = 12, 15
        cost = rng.random((M, K)).astype(np.float32) * 10
        benefit = 100.0 - cost  # all valid, all positive
        got = np.asarray(auction_assignment(jnp.asarray(benefit),
                                            jnp.ones(M, bool), jnp.ones(K, bool),
                                            eps=1e-4))
        rows, cols = linear_sum_assignment(cost)
        got_total = cost[np.arange(M), got].sum()
        opt_total = cost[rows, cols].sum()
        assert got_total <= opt_total + M * 2e-3
        assert len(set(got.tolist())) == M  # one-to-one


def test_auction_respects_invalid_pairs():
    benefit = jnp.asarray(np.array([[10.0, -np.inf], [-np.inf, -np.inf]], np.float32))
    got = np.asarray(auction_assignment(benefit, jnp.ones(2, bool), jnp.ones(2, bool)))
    assert got[0] == 0 and got[1] == -1


def test_link_frames_basic():
    state = TrackingState.empty(8)
    cy = jnp.asarray([10.0, 50.0, 90.0, 0.0])
    cx = jnp.asarray([10.0, 50.0, 90.0, 0.0])
    area = jnp.asarray([100.0, 120.0, 90.0, 0.0])
    mask = jnp.asarray([True, True, True, False])
    state, ids = link_frames(state, cy, cx, area, mask)
    assert np.asarray(ids)[:3].tolist() == [1, 2, 3]
    # next frame: cells moved slightly, order permuted
    cy2 = jnp.asarray([51.0, 91.0, 11.0, 0.0])
    cx2 = jnp.asarray([49.0, 89.0, 12.0, 0.0])
    area2 = jnp.asarray([121.0, 88.0, 101.0, 0.0])
    state, ids2 = link_frames(state, cy2, cx2, area2, mask)
    assert np.asarray(ids2)[:3].tolist() == [2, 3, 1]


def test_track_movie_with_memory_and_new_cells():
    T, N = 6, 5
    cy = np.zeros((T, N), np.float32)
    cx = np.zeros((T, N), np.float32)
    area = np.full((T, N), 100.0, np.float32)
    mask = np.zeros((T, N), bool)
    # two cells drifting slowly; cell B disappears at t=2,3 and returns at t=4 (memory)
    for t in range(T):
        cy[t, 0], cx[t, 0] = 20 + t, 20
        mask[t, 0] = True
        if t not in (2, 3):
            cy[t, 1], cx[t, 1] = 70, 70 + t
            mask[t, 1] = True
    # a third cell appears at t=3, farther than search_range from everything
    for t in range(3, T):
        cy[t, 2], cx[t, 2] = 5, 400
        mask[t, 2] = True
    ids = np.asarray(track_movie(jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
                                 jnp.asarray(mask)))
    a_ids = ids[:, 0]
    assert len(set(a_ids.tolist())) == 1  # stable track
    b_ids = [ids[t, 1] for t in range(T) if t not in (2, 3)]
    assert len(set(b_ids)) == 1  # rejoined after 2-frame gap (memory=3)
    c_ids = {ids[t, 2] for t in range(3, T)}
    assert len(c_ids) == 1 and c_ids.isdisjoint(set(a_ids.tolist()) | set(b_ids))


def test_track_movie_memory_expiry():
    T, N = 8, 2
    cy = np.zeros((T, N), np.float32)
    cx = np.zeros((T, N), np.float32)
    area = np.full((T, N), 100.0, np.float32)
    mask = np.zeros((T, N), bool)
    for t in range(T):
        if t == 0 or t >= 5:  # gap of 4 frames > memory=3
            cy[t, 0], cx[t, 0] = 30, 30
            mask[t, 0] = True
    ids = np.asarray(track_movie(jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
                                 jnp.asarray(mask)))
    assert ids[0, 0] != ids[5, 0]  # track expired, new id assigned


def test_track_movie_with_drift():
    # large coherent drift with small unrelated motion: without drift correction the
    # match would exceed search_range
    T, N = 3, 2
    cy = np.zeros((T, N), np.float32)
    cx = np.zeros((T, N), np.float32)
    area = np.full((T, N), 100.0, np.float32)
    mask = np.ones((T, N), bool)
    drifts = np.zeros((T, 2), np.float32)
    base = np.array([[50.0, 50.0], [120.0, 80.0]])
    for t in range(T):
        shift = -150.0 * t  # content moves +150 px per frame
        cy[t] = base[:, 0] + 150.0 * t
        cx[t] = base[:, 1]
        drifts[t] = (-150.0 if t > 0 else 0.0, 0.0)
    ids = np.asarray(track_movie(jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
                                 jnp.asarray(mask), drifts=jnp.asarray(drifts)))
    assert (ids[0] == ids[1]).all() and (ids[0] == ids[2]).all()


def test_track_movie_invalid_frames():
    T, N = 5, 1
    cy = np.full((T, N), 10.0, np.float32)
    cx = np.full((T, N), 10.0, np.float32)
    area = np.full((T, N), 50.0, np.float32)
    mask = np.ones((T, N), bool)
    valid = np.array([True, True, False, True, True])
    ids = np.asarray(track_movie(jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(area),
                                 jnp.asarray(mask), frame_valid=jnp.asarray(valid)))
    assert ids[2, 0] == 0  # invalid frame unlabeled
    assert ids[0, 0] == ids[1, 0] == ids[3, 0] == ids[4, 0]


def test_compute_drift_chain(rng):
    from scipy import ndimage as ndi
    base = ndi.gaussian_filter(rng.random((96, 96)), 3.0)
    frames = [base]
    for t in range(2):
        frames.append(np.real(np.fft.ifft2(
            ndi.fourier_shift(np.fft.fft2(frames[-1]), (4.5, -2.25)))))
    drifts = np.asarray(compute_drift_chain(jnp.asarray(np.stack(frames),
                                                        dtype=jnp.float32)))
    np.testing.assert_allclose(drifts[0], 0)
    np.testing.assert_allclose(drifts[1:], [[-4.5, 2.25]] * 2, atol=0.1)


def test_local_drift_field(rng):
    # textured image: windowed phase correlation needs spectral content (overly
    # smooth tiles whiten to noise under skimage's default phase normalization)
    from scipy import ndimage as ndi
    base = ndi.gaussian_filter(rng.random((128, 128)), 1.0)
    moved = np.real(np.fft.ifft2(ndi.fourier_shift(np.fft.fft2(base), (3.0, -2.0))))
    sy, sx = local_drift_field(jnp.asarray(base.astype(np.float32)),
                               jnp.asarray(moved.astype(np.float32)),
                               window_size=64, step_size=32)
    np.testing.assert_allclose(np.median(np.asarray(sy)), -3.0, atol=0.2)
    np.testing.assert_allclose(np.median(np.asarray(sx)), 2.0, atol=0.2)


def test_frame_cellinfo():
    lab = np.zeros((32, 32), np.int32)
    lab[2:13, 2:16] = 1
    lab[2:13, 17:30] = 2
    lab[14:28, 2:16] = 3
    lab[14:28, 17:30] = 4
    table = frame_cellinfo(jnp.asarray(lab), capacity=8)
    assert np.asarray(table.empty_cell)[:4].tolist() == [0, 0, 0, 0]
    assert np.asarray(table.empty_cell)[4:].tolist() == [1] * 4
    assert np.asarray(table.valid)[:4].tolist() == [1, 1, 1, 1]
    np.testing.assert_allclose(np.asarray(table.area)[0], 11 * 14)
    assert np.asarray(table.n_neighbors)[0] >= 2
    df = table.to_pandas()
    assert set(df.columns) >= {"area", "label", "neighbors", "valid", "empty_cell"}
    back = CellTable.from_pandas(df, capacity=8)
    np.testing.assert_allclose(np.asarray(back.area), np.asarray(table.area))
    assert np.asarray(back.n_neighbors).tolist() == np.asarray(table.n_neighbors).tolist()


def test_frame_cellinfo_without_neighbors():
    lab = np.zeros((32, 32), np.int32)
    lab[2:13, 2:16] = 1
    lab[2:13, 17:30] = 2
    lab[14:28, 2:16] = 3
    lab[14:28, 17:30] = 4
    full = frame_cellinfo(jnp.asarray(lab), capacity=8)
    lean = frame_cellinfo(jnp.asarray(lab), capacity=8, with_neighbors=False)
    # everything except the neighbor graph matches the full table
    np.testing.assert_allclose(np.asarray(lean.area), np.asarray(full.area))
    np.testing.assert_allclose(np.asarray(lean.cy), np.asarray(full.cy))
    np.testing.assert_allclose(np.asarray(lean.cx), np.asarray(full.cx))
    assert np.asarray(lean.valid).tolist() == np.asarray(full.valid).tolist()
    assert np.asarray(lean.empty_cell).tolist() == np.asarray(full.empty_cell).tolist()
    # neighbor outputs are zero-filled, not garbage
    assert np.asarray(lean.n_neighbors).sum() == 0
    assert np.asarray(lean.neighbors).sum() == 0


def test_track_movie_nearest_pixel():
    from tissue_image_processing_tpu.core.tracking import track_movie_nearest_pixel
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tissue import grid_labels
    T = 3
    labels = np.stack([grid_labels() for _ in range(T)])
    N = 64
    cy = np.zeros((T, N), np.float32)
    cx = np.zeros((T, N), np.float32)
    mask = np.zeros((T, N), bool)
    for t in range(T):
        for l in range(1, 37):
            ys, xs = np.nonzero(labels[t] == l)
            cy[t, l - 1] = ys.mean()
            cx[t, l - 1] = xs.mean()
            mask[t, l - 1] = True
    ids = track_movie_nearest_pixel(labels, cy, cx, mask)
    assert (ids[0, :36] == ids[1, :36]).all() and (ids[1, :36] == ids[2, :36]).all()
    assert len(set(ids[0, :36].tolist())) == 36


def _lineage_links(ids_list):
    """Set of (t_prev, i_prev, t_cur, i_cur) links implied by shared track ids
    (parent = most recent earlier appearance of the same id)."""
    last_seen = {}
    links = set()
    news = set()
    for t, ids in enumerate(ids_list):
        for i, v in enumerate(ids):
            v = int(v)
            if v == 0:
                continue
            if v in last_seen:
                links.add((*last_seen[v], t, i))
            else:
                news.add((t, i))
            last_seen[v] = (t, i)
    return links, news


def test_track_movie_crocker_grier_parity(rng):
    """Whole-movie lineage parity vs the exact Crocker-Grier oracle (trackpy's
    algorithm, reference tissue_info.py:1881-1938): >= 99% of links identical on a
    100-frame drifting movie with exits, divisions and memory gaps."""
    from oracles import crocker_grier_link

    T, N = 100, 64
    n0 = 40
    pos = np.zeros((N, 2))
    pos[:n0] = rng.uniform(50, 950, (n0, 2))
    area = np.zeros(N)
    area[:n0] = rng.uniform(900, 1600, n0)
    alive = np.zeros(N, bool)
    alive[:n0] = True
    gone_until = np.full(N, -1)

    cys, cxs, areas, masks = [], [], [], []
    for t in range(T):
        drift = np.array([1.2, -0.8])
        pos[alive] += drift + rng.normal(0, 1.5, (alive.sum(), 2))
        # events
        if t % 7 == 3:  # a division: spawn a new cell near a random live one
            free = np.nonzero(~alive & (gone_until < t))[0]
            src = rng.choice(np.nonzero(alive)[0])
            if len(free):
                j = free[0]
                alive[j] = True
                pos[j] = pos[src] + rng.normal(0, 8, 2)
                area[j] = area[src] * 0.6
        if t % 11 == 5:  # an exit
            j = rng.choice(np.nonzero(alive)[0])
            alive[j] = False
            gone_until[j] = T + 1
        vis = alive.copy()
        if t % 5 == 2:  # one cell missed this frame (memory gap)
            j = rng.choice(np.nonzero(alive)[0])
            vis[j] = False
        cys.append(pos[:, 0].copy())
        cxs.append(pos[:, 1].copy())
        areas.append(area.copy())
        masks.append(vis.copy())

    cy = np.stack(cys).astype(np.float32)
    cx = np.stack(cxs).astype(np.float32)
    ar = np.stack(areas).astype(np.float32)
    mk = np.stack(masks)

    ids_dev = np.asarray(track_movie(jnp.asarray(cy), jnp.asarray(cx),
                                     jnp.asarray(ar), jnp.asarray(mk),
                                     capacity=2 * N))
    oracle_frames = [(cy[t][mk[t]], cx[t][mk[t]], ar[t][mk[t]]) for t in range(T)]
    ids_orc = []
    for t in range(T):
        full = np.zeros(N, np.int64)
        ids_orc.append(full)
    for t, ids in enumerate(crocker_grier_link(oracle_frames)):
        ids_orc[t][mk[t]] = ids

    dev_rows = [ids_dev[t] for t in range(T)]
    links_dev, news_dev = _lineage_links(dev_rows)
    links_orc, news_orc = _lineage_links(ids_orc)
    inter = len(links_dev & links_orc)
    parity = inter / max(len(links_orc), 1)
    assert parity >= 0.99, f"lineage parity {parity:.4f} ({inter}/{len(links_orc)})"
    assert news_dev == news_orc


def test_track_movie_dense_content_parity(rng):
    """Dense bench-like content (700 cells / 1024^2, 3% flicker): parity vs the
    ADAPTIVE Crocker-Grier oracle (trackpy shrinks the search radius for
    oversized subnets — at this density the whole frame is one subnet at
    sr=100, so the reference's effective radius is much smaller)."""
    from oracles import crocker_grier_link

    T, N = 6, 700
    pos = np.stack([rng.uniform(0, 1024, N), rng.uniform(0, 1024, N)], 1)
    area = rng.uniform(900, 2500, N)
    cys, cxs, ars, mks = [], [], [], []
    for t in range(T):
        pos = pos + np.array([1.5, -1.0]) + rng.normal(0, 0.8, pos.shape)
        a = area * (1 + rng.normal(0, 0.03, N))
        vis = rng.random(N) > 0.03
        cys.append(pos[:, 0].copy()); cxs.append(pos[:, 1].copy())
        ars.append(a.copy()); mks.append(vis)
    cy = np.stack(cys).astype(np.float32)
    cx = np.stack(cxs).astype(np.float32)
    ar = np.stack(ars).astype(np.float32)
    mk = np.stack(mks)

    from tissue_image_processing_tpu.core.tracking import (
        adaptive_effective_ranges)

    ranges = adaptive_effective_ranges(cy, cx, ar, mk)
    assert ranges[1:].max() < 100.0  # dense frames DO shrink
    ids_dev = np.asarray(track_movie(jnp.asarray(cy), jnp.asarray(cx),
                                     jnp.asarray(ar), jnp.asarray(mk),
                                     capacity=2 * N,
                                     search_ranges=jnp.asarray(ranges)))
    frames, rowmaps = [], []
    for t in range(T):
        rows = np.nonzero(mk[t])[0]
        rowmaps.append(rows)
        frames.append((cy[t, rows], cx[t, rows], ar[t, rows]))
    orc = crocker_grier_link(frames)
    ids_orc = [np.zeros(N, np.int64) for _ in range(T)]
    for t in range(T):
        ids_orc[t][rowmaps[t]] = orc[t]
    links_dev, _ = _lineage_links([ids_dev[t] for t in range(T)])
    links_orc, _ = _lineage_links(ids_orc)
    parity = len(links_dev & links_orc) / max(len(links_orc), 1)
    assert parity >= 0.99, f"dense-content lineage parity {parity:.4f}"
