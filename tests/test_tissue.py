import os

import numpy as np
import jax.numpy as jnp
import pytest

from tissue_image_processing_tpu.core.tissue import Tissue
from tissue_image_processing_tpu.core.cell_table import is_positive_for_type
from tissue_image_processing_tpu.core import features as F


def grid_labels(H=64, W=64, rows=6, cols=6):
    """6x6 grid of cells separated by 1px lines (cells >= 2 rings from the border
    exist so edge-suppressed event detection can fire)."""
    lab = np.zeros((H, W), np.int32)
    ch, cw = H // rows, W // cols
    k = 1
    for r in range(rows):
        for c in range(cols):
            lab[r * ch + 1:(r + 1) * ch, c * cw + 1:(c + 1) * cw] = k
            k += 1
    return lab


def make_tissue(T=4, capacity=64, delaminate=None, divide=None):
    """A movie of grid cells; optionally remove cell at frame (delamination) or
    split one cell into two (division)."""
    tissue = Tissue(T, "test_session", channel_names=["zo", "atoh"],
                    capacity=capacity)
    for f in range(1, T + 1):
        lab = grid_labels()
        if delaminate and f >= delaminate[1]:
            # merge cell `delaminate[0]` into its right neighbor
            gone = delaminate[0]
            lab[lab == gone] = gone + 1
        if divide and f >= divide[1]:
            cell = divide[0]
            ys, xs = np.nonzero(lab == cell)
            mid = (ys.min() + ys.max()) // 2
            new = lab.max() + 1
            sel = (lab == cell) & (np.arange(lab.shape[0])[:, None] > mid)
            lab[sel] = new
            lab[(lab == cell) & (np.arange(lab.shape[0])[:, None] == mid)] = 0
        tissue.set_labels(f, lab)
        tissue.calculate_frame_cellinfo(f)
    return tissue


def test_cellinfo_exact_fallback_on_adversarial_labels():
    # alternating 1-px labels overflow the compacted adjacency's per-row vote
    # budget; calculate_frame_cellinfo must detect that and produce the exact
    # neighbor graph anyway (via the unconditional-scatter fallback)
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    import jax.numpy as jnp
    import tissue_image_processing_tpu.core.tissue as tissue_mod
    lab = np.tile(np.arange(1, 33, dtype=np.int32), (256, 8))  # (256, 256)
    tissue = Tissue(1, "adversarial", capacity=64)
    tissue.set_labels(1, lab)
    old_k = tissue_mod._NEIGHBOR_COMPACT_K
    tissue_mod._NEIGHBOR_COMPACT_K = 8  # force the overflow branch
    try:
        tissue.calculate_frame_cellinfo(1)
    finally:
        tissue_mod._NEIGHBOR_COMPACT_K = old_k
    got = tissue.get_cells_info(1)
    want = frame_cellinfo(jnp.asarray(lab), capacity=64)
    np.testing.assert_array_equal(np.asarray(got.n_neighbors),
                                  np.asarray(want.n_neighbors))
    np.testing.assert_array_equal(np.asarray(got.neighbors),
                                  np.asarray(want.neighbors))


def test_frame_analysis_and_tracking():
    tissue = make_tissue()
    tissue.track_cells()
    t1 = tissue.get_cells_info(1)
    t4 = tissue.get_cells_info(4)
    ids1 = np.asarray(t1.label)[np.asarray(t1.valid_mask())]
    ids4 = np.asarray(t4.label)[np.asarray(t4.valid_mask())]
    assert set(ids1.tolist()) == set(ids4.tolist())


def test_cell_types_classification():
    tissue = make_tissue(T=1)
    lab = tissue.get_labels(1)
    marker = np.zeros(lab.shape, np.float32)
    hc_cells = [1, 6, 11, 16]
    for c in hc_cells:
        marker[lab == c] = 1000.0
    marker += np.random.default_rng(0).random(lab.shape).astype(np.float32)
    tissue.calc_cell_types(marker, 1, "HC", threshold=0.1)
    table = tissue.get_cells_info(1)
    pos = np.asarray(is_positive_for_type(np.asarray(table.type), 0))
    exists = np.asarray(table.empty_cell) == 0
    got_hc = set((np.nonzero(pos & exists)[0] + 1).tolist())
    assert got_hc == set(hc_cells)
    # type map painted
    cm = tissue.get_cell_types(1)
    assert cm[lab == 1].max() == 1
    assert cm[lab == 2].max() == 0
    assert (cm[lab == 0] == 255).all()


def test_event_detection_delamination():
    tissue = make_tissue(T=5, delaminate=(15, 3))
    tissue.track_cells()
    tissue.find_events()
    ev = tissue.get_events()
    delams = ev.query('type == "delamination"')
    assert len(delams) >= 1
    # one of the merged pair's track ids disappears (the merged centroid is
    # equidistant from both old tracks, so either assignment is a valid matching)
    t2 = tissue.get_cells_info(2)
    merged_ids = {int(np.asarray(t2.label)[14]), int(np.asarray(t2.label)[15])}
    assert merged_ids & set(int(v) for v in delams.cell_id.values)


def test_event_detection_division():
    tissue = make_tissue(T=5, divide=(15, 3))
    tissue.track_cells()
    tissue.find_events()
    ev = tissue.get_events()
    divs = ev.query('type == "division"')
    assert len(divs) >= 1
    assert (divs.daughter_id > 0).all()


def test_event_detection_division_under_drift():
    """Division with nonzero frame drift: the neighbor lookup must use the
    neighbor's CURRENT-frame centroid + drift (the same cur->prev convention
    as the candidate itself, reference ``tissue_info.py:757-767``). Joining to
    the previous-frame centroid double-applies the drift, which at 6 px/frame
    on 10-px cells lands the mother lookup in the cell above — assigning the
    division to the wrong mother."""
    T, shift = 5, 6
    tissue = Tissue(T, "drift_division", channel_names=["zo"], capacity=64)
    for f in range(1, T + 1):
        lab = grid_labels()
        if f >= 3:
            # split cell 15 into top (keeps label 15) / bottom (new label 37)
            ys, _ = np.nonzero(lab == 15)
            mid = (ys.min() + ys.max()) // 2
            new = lab.max() + 1
            rows = np.arange(lab.shape[0])[:, None]
            lab[(lab == 15) & (rows > mid)] = new
            lab[(lab == 15) & (rows == mid)] = 0
        lab = np.roll(lab, (f - 1) * shift, axis=0)
        tissue.set_labels(f, lab)
        tissue.calculate_frame_cellinfo(f)
    # content moves +shift rows per frame: cur coords + drift = prev coords.
    # Track ids are the (frame-consistent) segmentation labels — running the
    # tracker here would be ambiguous by construction (both halves of the
    # split sit nearest the mother's old centroid), and this test targets
    # event detection, not assignment.
    tissue.drifts[1:] = (-float(shift), 0.0)
    t3 = tissue.get_cells_info(3)
    mother_id = int(np.asarray(t3.label)[14])    # top half keeps seg label 15
    daughter_id = int(np.asarray(t3.label)[36])  # bottom half is seg label 37
    tissue.find_events()
    divs = tissue.get_events().query('type == "division"')
    assert daughter_id in set(int(v) for v in divs.daughter_id.values)
    row = divs[divs.daughter_id == daughter_id].iloc[0]
    assert int(row.cell_id) == mother_id


def test_event_detection_differentiation():
    tissue = make_tissue(T=6)
    tissue.track_cells()
    # cell 15 (doubly interior) becomes HC-positive at frame 4
    for f in range(1, 7):
        lab = tissue.get_labels(f)
        marker = np.ones(lab.shape, np.float32)
        if f >= 4:
            marker[lab == 15] = 1000.0
        marker[lab == 22] = 1000.0  # always-HC cell
        tissue.calc_cell_types(marker, f, "HC", threshold=0.3)
    tissue.find_events()
    ev = tissue.get_events()
    diffs = ev.query('type == "differentiation"')
    t3 = tissue.get_cells_info(3)
    expected_id = int(np.asarray(t3.label)[14])
    assert expected_id in diffs.cell_id.values


def test_fix_cell_types_after_tracking():
    tissue = make_tissue(T=30)
    tissue.track_cells()
    rng = np.random.default_rng(0)
    for f in range(1, 31):
        lab = tissue.get_labels(f)
        marker = np.ones(lab.shape, np.float32)
        marker[lab == 22] = 1000.0          # stable HC
        if f == 15:
            marker[lab == 2] = 1000.0       # one-frame glitch on cell 2
        if f >= 16:
            marker[lab == 15] = 1000.0      # true differentiation at frame 16
        tissue.calc_cell_types(marker, f, "HC", threshold=0.3)
    tissue.fix_cell_types_after_tracking(min_frame_for_diff_detection=5)
    # glitch removed: cell 2 is SC at frame 15 after repair
    t15 = tissue.get_cells_info(15)
    assert int(np.asarray(t15.type)[1]) == 0
    # differentiating cell: SC before, HC after
    t10 = tissue.get_cells_info(10)
    t25 = tissue.get_cells_info(25)
    assert int(np.asarray(t10.type)[14]) == 0
    assert int(np.asarray(t25.type)[14]) == 1


def test_seg_save_load_roundtrip(tmp_path):
    tissue = make_tissue(T=2)
    tissue.track_cells()
    tissue.type_names = ["HC"]
    tissue.drifts[1] = (1.5, -2.0)
    path = os.path.join(tmp_path, "session.seg")
    for _ in tissue.save(path):
        pass
    assert os.path.exists(path)

    fresh = Tissue(2, os.path.join(tmp_path, "other"), channel_names=[],
                   capacity=64)
    for _ in fresh.load(path):
        pass
    np.testing.assert_array_equal(fresh.get_labels(1), tissue.get_labels(1))
    np.testing.assert_allclose(fresh.drifts, tissue.drifts)
    assert fresh.type_names == ["HC"]
    a = tissue.get_cells_info(1)
    b = fresh.get_cells_info(1)
    np.testing.assert_allclose(np.asarray(a.area), np.asarray(b.area))
    np.testing.assert_array_equal(np.asarray(a.label), np.asarray(b.label))
    tissue.clean_up()
    fresh.clean_up()


def test_features_basic():
    tissue = make_tissue(T=1)
    table = tissue.get_cells_info(1)
    r = np.asarray(F.roundness(table))
    s = np.asarray(F.shape_index(table))
    exists = np.asarray(table.empty_cell) == 0
    assert (r[exists] > 0).all() and (r[exists] < 1.2).all()
    # squares: shape index = 4L/L = 4ish
    assert abs(np.median(s[exists]) - 4.0) < 0.6
    mask = jnp.asarray(exists)
    assert float(F.total_area(table, mask)) == np.asarray(table.area)[exists].sum()
    d = float(F.density(table, mask))
    assert d > 0
    # neighbors-from-type: give half the cells type bit 0
    import dataclasses
    types = np.zeros(table.capacity, np.uint8)
    types[::2] = 1
    t2 = dataclasses.replace(table, type=jnp.asarray(types))
    nn = np.asarray(F.n_neighbors_from_type(t2, 0, True))
    assert nn[exists].sum() > 0
    corr = float(F.neighbors_correlation(t2, jnp.asarray((types == 1).astype(np.float32)),
                                         jnp.asarray(exists)))
    assert -1.1 < corr < 1.1


def test_features_psi6_hex():
    # perfect hexagonal arrangement around a center cell -> psi6 ~ 1
    from tissue_image_processing_tpu.core.cell_table import CellTable
    import dataclasses
    table = CellTable.empty(8, 8)
    angles = np.arange(6) * np.pi / 3
    cx = np.zeros(8, np.float32)
    cy = np.zeros(8, np.float32)
    cx[1:7] = 10 * np.cos(angles)
    cy[1:7] = 10 * np.sin(angles)
    nbr = np.zeros((8, 8), np.int32)
    nbr[0, :6] = np.arange(2, 8)
    table = dataclasses.replace(
        table, cx=jnp.asarray(cx), cy=jnp.asarray(cy), neighbors=jnp.asarray(nbr))
    psi = np.asarray(F.psi_n(table, table.neighbors, 6))
    assert abs(psi[0] - 1.0) < 1e-4


def test_spatial_map():
    tissue = make_tissue(T=1)
    table = tissue.get_cells_info(1)
    exists = np.asarray(table.empty_cell) == 0
    vals = jnp.asarray(exists.astype(np.float32))
    m = F.spatial_map(table, (64, 64), window_radius=20.0, step_size=16,
                      values=vals, mask=jnp.asarray(exists), feature="mean")
    assert m.shape == (64, 64)
    assert float(jnp.max(m)) <= 1.0


def test_stage_shift_chain_mapping(tmp_path):
    import pandas as pd
    t = Tissue(3, os.path.join(str(tmp_path), "movie.tif"), channel_names=[],
               capacity=8)
    # stage columns are in (z, y, x) physical units; image rows follow stage y
    t.stage_locations = pd.DataFrame({
        "z": [0.0, 0.0, 0.0],
        "y": [10.0, 12.0, 12.0],
        "x": [5.0, 5.0, 4.0],
        "physical_size_z": [1.0] * 3,
        "physical_size_y": [0.1] * 3,
        "physical_size_x": [0.1] * 3,
    })
    shifts = t.stage_shift_chain(1, 3)
    assert shifts.shape == (3, 2)
    assert np.allclose(shifts[0], 0)
    assert np.allclose(shifts[1], [20.0, 0.0])   # dy = 2.0 / 0.1 px
    assert np.allclose(shifts[2], [0.0, -10.0])  # dx = -1.0 / 0.1 px


def test_out_of_core_swap_keeps_one_frame(tmp_path):
    T = 12
    t = Tissue(T, os.path.join(str(tmp_path), "ooc.tif"), channel_names=["zo"],
               capacity=64, use_working_dir=True)
    rng = np.random.default_rng(0)
    frames = {}
    for f in range(1, T + 1):
        lab = rng.integers(0, 50, (256, 256)).astype(np.int32)
        frames[f] = lab
        t.set_labels(f, lab)
        # at most ONE frame of each artifact lives in RAM (reference
        # tissue_info.py:310-353 one-frame disk swap)
        assert sum(x is not None for x in t._labels) <= 1
    # random-access reads swap the right frame back in, bit-exact
    for f in rng.permutation(np.arange(1, T + 1))[:6]:
        got = t.get_labels(int(f))
        np.testing.assert_array_equal(got, frames[int(f)])
        assert sum(x is not None for x in t._labels) <= 1
    # tables + types swap independently
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    import jax.numpy as jnp
    tb = frame_cellinfo(jnp.asarray(frames[3]), capacity=64)
    t.set_cells_info(3, tb)
    t.set_cell_types(5, np.zeros((256, 256), np.uint8))
    assert t.get_cells_info(3) is not None
    assert t.get_cells_info(4) is None
    assert t.get_cell_types(5) is not None
    assert sum(x is not None for x in t._tables) <= 1
    t.clean_up()


def test_out_of_core_save_load_roundtrip(tmp_path):
    T = 4
    t = Tissue(T, os.path.join(str(tmp_path), "oocrt.tif"), channel_names=["zo"],
               capacity=32, use_working_dir=True)
    rng = np.random.default_rng(1)
    labs = {f: rng.integers(0, 20, (64, 64)).astype(np.int32)
            for f in range(1, T + 1)}
    for f, lab in labs.items():
        t.set_labels(f, lab)
    seg = os.path.join(str(tmp_path), "session.seg")
    for _ in t.save(seg):
        pass
    fresh = Tissue(T, os.path.join(str(tmp_path), "oocrt2.tif"),
                   channel_names=["zo"], capacity=32, use_working_dir=True)
    for _ in fresh.load(seg):
        pass
    for f, lab in labs.items():
        np.testing.assert_array_equal(fresh.get_labels(f), lab)
        assert sum(x is not None for x in fresh._labels) <= 1
    fresh.clean_up()
    t.clean_up()


def test_legacy_types_map_migration(tmp_path):
    """A reference-written .seg (no format marker) migrates pre-bitmask types
    maps ONCE at load(); maps written by this package round-trip unchanged."""
    import zipfile

    # build a legacy archive by hand: types file, no marker
    legacy_dir = tmp_path / "legacy_wd"
    legacy_dir.mkdir()
    # pre-bitmask encoding: 0=invalid, 1=HC, 2=SC (tissue_info.py:4216-4228)
    old = np.array([[0, 1], [2, 1]], np.uint8)
    np.save(legacy_dir / "frame_1_types.npy", old)
    seg = tmp_path / "legacy.seg"
    with zipfile.ZipFile(seg, "w") as z:
        z.write(legacy_dir / "frame_1_types.npy", "frame_1_types.npy")

    t = Tissue(1, os.path.join(str(tmp_path), "legacy.tif"), channel_names=[],
               capacity=8, use_working_dir=True)
    for _ in t.load(str(seg)):
        pass
    got = t.get_cell_types(1)
    np.testing.assert_array_equal(got, np.array([[255, 1], [0, 1]], np.uint8))
    t.clean_up()


def test_new_format_types_map_not_remigrated(tmp_path):
    """Regression (round-2 ADVICE): a NEW-format types map whose values happen
    to all be in {0,1,2} must survive swap-mode round-trips and save+load
    (the marker keeps load() from re-running the legacy migration)."""
    t = Tissue(2, os.path.join(str(tmp_path), "new.tif"), channel_names=[],
               capacity=8, use_working_dir=True)
    tm = np.array([[0, 1], [2, 1]], np.uint8)  # valid new-format values
    t.set_cell_types(1, tm.copy())
    t.set_cell_types(2, np.zeros((2, 2), np.uint8))  # forces frame-1 swap-out
    np.testing.assert_array_equal(t.get_cell_types(1), tm)  # swap round-trip
    seg = str(tmp_path / "own.seg")
    for _ in t.save(seg):
        pass
    t2 = Tissue(2, os.path.join(str(tmp_path), "new.tif"), channel_names=[],
                capacity=8, use_working_dir=True)
    for _ in t2.load(seg):
        pass
    np.testing.assert_array_equal(t2.get_cell_types(1), tm)
    t.clean_up()
    t2.clean_up()


def test_legacy_h5_neighbor_string_parsing(monkeypatch):
    """_read_legacy_h5 parses the h5-era string-encoded neighbor sets
    (tissue_info.py:3507-3517); pd.read_hdf is stubbed since pytables-backed
    fixtures cannot be written in this environment."""
    import pandas as pd
    from tissue_image_processing_tpu.core.tissue import Tissue

    fixture = pd.DataFrame({
        "neighbors": ["set()", "{np.int64(3), np.int64(7)}", "{1, 2}", {4}],
        "type": [0, 1, 0, 1],
    })
    monkeypatch.setattr(pd, "read_hdf", lambda path, key: fixture.copy())
    df = Tissue._read_legacy_h5("whatever.h5")
    assert df["neighbors"].tolist() == [set(), {3, 7}, {1, 2}, {4}]


def test_recoil_speed_from_circular_ablation(tmp_path):
    """Cells inside the fitted ablation circle moved 2 px radially OUTWARD
    plus a (1, -1) rigid drift; the analysis must cancel the drift and report
    radial_movement ~ -2 (positive = toward the center) on the rim cells —
    those touching the invalidated (ablated) center cell."""
    import dataclasses

    tissue = make_tissue(T=2)
    tissue.track_cells()
    t2 = tissue.get_cells_info(2)
    cx = np.asarray(t2.cx, float).copy()
    cy = np.asarray(t2.cy, float).copy()
    xc = yc = 32.0
    d = np.hypot(cx - xc, cy - yc)
    dd = d.copy()
    dd[np.asarray(t2.valid) == 0] = 1e9
    center_idx = int(dd.argmin())
    valid = np.asarray(t2.valid).copy()
    valid[center_idx] = 0  # the ablated hole
    ux = (cx - xc) / np.maximum(d, 1e-9)
    uy = (cy - yc) / np.maximum(d, 1e-9)
    t2b = dataclasses.replace(
        t2, cx=jnp.asarray(cx + 2 * ux + 1.0, jnp.float32),
        cy=jnp.asarray(cy + 2 * uy - 1.0, jnp.float32),
        valid=jnp.asarray(valid, jnp.int32))
    tissue.set_cells_info(2, t2b)
    tissue.shape_fitting_results[1]["circle"] = {
        "x_center": (xc, 0.0), "y_center": (yc, 0.0), "radius": (25.0, 0.0)}
    out = tissue.calc_recoil_speed_from_circular_ablation(
        "circle", 1, 2, save_path=str(tmp_path / "recoil.pkl"))
    assert len(out) > 0
    assert (out["n_invalid_neighbors"] > 0).all()
    # outward recoil: negative radial movement, ~-2 after drift cancellation
    assert (out["radial_movement"] < -1.0).all()
    assert abs(out["radial_movement"].mean() + 2.0) < 0.8
    assert (tmp_path / "recoil.pkl").exists()
    # unknown shape name raises
    with pytest.raises(KeyError):
        tissue.calc_recoil_speed_from_circular_ablation("ellipse", 1, 2,
                                                        save_path="")
    tissue.clean_up()


def test_orphan_scratch_dirs_swept(tmp_path):
    """A SIGKILL'd run leaves its scratch dir behind (no finalizer ran); the
    NEXT session for the same data must sweep dirs whose owner pid is dead —
    and leave live-owned and marker-less dirs alone."""
    import os

    from tissue_image_processing_tpu.core.tissue import (_PID_MARKER,
                                                         get_temp_directory)

    data = tmp_path / "movie.npy"
    data.write_bytes(b"")
    # a dead-owner dir (pid from a long-gone process), a live-owner dir
    # (our own pid), and a marker-less foreign dir
    dead = tmp_path / "movie.npy_temp_dead"
    dead.mkdir()
    (dead / _PID_MARKER).write_text("999999999")
    live = tmp_path / "movie.npy_temp_live"
    live.mkdir()
    (live / _PID_MARKER).write_text(str(os.getpid()))
    foreign = tmp_path / "movie.npy_temp_foreign"
    foreign.mkdir()

    wd = get_temp_directory(str(data))
    assert not dead.exists(), "dead-owner dir must be swept"
    assert live.exists() and foreign.exists()
    assert os.path.dirname(wd) == str(tmp_path), "scratch lives beside the data"
    assert (tmp_path / os.path.basename(wd) / _PID_MARKER).read_text() == str(os.getpid())


def test_pid_marker_not_archived(tmp_path):
    from tissue_image_processing_tpu.core.tissue import (
        _PID_MARKER, pack_archive_with_progress)
    import zipfile

    d = tmp_path / "wd"
    d.mkdir()
    (d / "frame_1_labels.npy").write_bytes(b"x")
    (d / _PID_MARKER).write_text("123")
    zp = str(tmp_path / "out.seg")
    for _ in pack_archive_with_progress(str(d), zp):
        pass
    assert _PID_MARKER not in zipfile.ZipFile(zp).namelist()
