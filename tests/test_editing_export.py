import os

import numpy as np
import pytest

from test_tissue import make_tissue
from tissue_image_processing_tpu.core.editing import (
    SegmentationEditor, draw_line, find_nearest_segmentation_pixel)
from tissue_image_processing_tpu.core import export as X
from tissue_image_processing_tpu.viz import overlays as V


def test_draw_line_matches_bresenham():
    rr, cc = draw_line(0, 0, 4, 9)
    assert rr[0] == 0 and cc[0] == 0 and rr[-1] == 4 and cc[-1] == 9
    assert len(rr) == 10
    # monotone steps
    assert (np.abs(np.diff(rr)) <= 1).all() and (np.abs(np.diff(cc)) <= 1).all()


def test_find_nearest_segmentation_pixel():
    lab = np.ones((20, 20), np.int32)
    lab[10, 15] = 0
    x, y = find_nearest_segmentation_pixel(lab, (14, 10), distance_limit=5)
    assert (x, y) == (15, 10)
    x, y = find_nearest_segmentation_pixel(lab, (2, 2), distance_limit=3)
    assert x is None


def test_add_segmentation_line_splits_cell():
    tissue = make_tissue(T=1)
    ed = SegmentationEditor(tissue)
    lab = tissue.get_labels(1)
    ys, xs = np.nonzero(lab == 15)
    n_before = int((np.asarray(tissue.get_cells_info(1).empty_cell) == 0).sum())
    mid_y = (ys.min() + ys.max()) // 2
    # GUI drag protocol: press (snap start to boundary), drag segments, release
    # (snap end to boundary) — reference gui.py:776-839
    ed.add_segmentation_line(1, (xs.min(), mid_y), initial=True)
    ed.add_segmentation_line(1, (xs.max(), mid_y), point2=(xs.min(), mid_y))
    ed.add_segmentation_line(1, (xs.max(), mid_y), final=True)
    lab2 = tissue.get_labels(1)
    n_after = int((np.asarray(tissue.get_cells_info(1).empty_cell) == 0).sum())
    assert n_after == n_before + 1
    # the two halves have different labels
    top = lab2[ys.min(), xs.min() + 2]
    bottom = lab2[ys.max(), xs.min() + 2]
    assert top != bottom and top > 0 and bottom > 0


def test_remove_segmentation_line_merges_cells():
    tissue = make_tissue(T=1)
    ed = SegmentationEditor(tissue)
    lab = tissue.get_labels(1)
    n_before = int((np.asarray(tissue.get_cells_info(1).empty_cell) == 0).sum())
    # the vertical boundary between cell 15 and 16: col between them
    ys, xs = np.nonzero(lab == 15)
    boundary_col = xs.max() + 1
    mid_y = (ys.min() + ys.max()) // 2
    ed.remove_segmentation_line(1, (boundary_col, mid_y))
    lab2 = tissue.get_labels(1)
    n_after = int((np.asarray(tissue.get_cells_info(1).empty_cell) == 0).sum())
    assert n_after == n_before - 1
    assert lab2[mid_y, boundary_col] > 0  # line gone


def test_undo_roundtrip_bitexact():
    """add -> remove -> undo -> undo restores the original frame bit-exactly:
    labels, table (track ids, areas, types) and the cell-types map. The
    'remove' undo must restore the merge — not just recompute the table
    (reference undo, tissue_info.py:2977-2999)."""
    tissue = make_tissue(T=1)
    tissue.type_names = ["HC"]
    lab0 = tissue.get_labels(1)
    marker = np.ones(lab0.shape, np.float32)
    marker[lab0 == 15] = 1000.0
    tissue.calc_cell_types(marker, 1, "HC", threshold=0.3)
    ed = SegmentationEditor(tissue)
    labels_orig = tissue.get_labels(1).copy()
    table_orig = tissue.get_cells_info(1)
    types_orig = tissue.get_cell_types(1).copy()

    ys, xs = np.nonzero(labels_orig == 15)
    mid_y = (ys.min() + ys.max()) // 2
    # action 1: split cell 15 horizontally
    ed.add_segmentation_line(1, (xs.min(), mid_y), initial=True)
    ed.add_segmentation_line(1, (xs.max(), mid_y), point2=(xs.min(), mid_y))
    ed.add_segmentation_line(1, (xs.max(), mid_y), final=True)
    labels_split = tissue.get_labels(1).copy()
    table_split = tissue.get_cells_info(1)
    assert (labels_split != labels_orig).any()
    # action 2: merge cells 15 and 16 (remove their shared vertical boundary)
    ed.remove_segmentation_line(1, (xs.max() + 1, ys.min() + 1))
    assert (tissue.get_labels(1) != labels_split).any()

    # undo the remove: the split state returns exactly (merge restored)
    assert ed.undo_last_action(1) == 1
    np.testing.assert_array_equal(tissue.get_labels(1), labels_split)
    got = tissue.get_cells_info(1)
    for field in ("label", "area", "type", "cx", "cy", "empty_cell"):
        np.testing.assert_array_equal(np.asarray(getattr(got, field)),
                                      np.asarray(getattr(table_split, field)))
    # undo the add: the original frame returns exactly
    assert ed.undo_last_action(1) == 1
    np.testing.assert_array_equal(tissue.get_labels(1), labels_orig)
    got = tissue.get_cells_info(1)
    for field in ("label", "area", "type", "cx", "cy", "empty_cell"):
        np.testing.assert_array_equal(np.asarray(getattr(got, field)),
                                      np.asarray(getattr(table_orig, field)))
    np.testing.assert_array_equal(tissue.get_cell_types(1), types_orig)
    # stack exhausted
    assert ed.undo_last_action(1) == 0


def test_undo_after_interrupted_line():
    """Starting a new action while a line is half-drawn (no final=True) must
    seal the open line's patch first — otherwise its zeroed pixels become
    unrecoverable and undo can never restore the original frame."""
    tissue = make_tissue(T=1)
    ed = SegmentationEditor(tissue)
    labels_orig = tissue.get_labels(1).copy()
    ys, xs = np.nonzero(labels_orig == 15)
    mid_y = (ys.min() + ys.max()) // 2
    # half-drawn line: initial only, never finalized
    ed.add_segmentation_line(1, (xs.min() + 2, mid_y), initial=True)
    assert (tissue.get_labels(1) != labels_orig).any()
    # a remove on another boundary interrupts it
    ed.remove_segmentation_line(1, (xs.max() + 1, mid_y))
    assert ed.undo_last_action(1) == 1   # undo the remove
    assert ed.undo_last_action(1) == 1   # undo the sealed half-line
    np.testing.assert_array_equal(tissue.get_labels(1), labels_orig)
    assert ed.undo_last_action(1) == 0


def test_change_cell_type_and_invalid():
    tissue = make_tissue(T=1)
    tissue.type_names = ["HC"]
    ed = SegmentationEditor(tissue)
    lab = tissue.get_labels(1)
    ys, xs = np.nonzero(lab == 15)
    pos = (xs[0], ys[0])
    ed.change_cell_type(1, pos, "HC")
    assert int(np.asarray(tissue.get_cells_info(1).type)[14]) == 1
    ed.change_cell_type(1, pos, "HC")  # toggle back
    assert int(np.asarray(tissue.get_cells_info(1).type)[14]) == 0
    ed.make_invalid_cell(1, pos)
    assert int(np.asarray(tissue.get_cells_info(1).valid)[14]) == 0


def test_exports(tmp_path):
    tissue = make_tissue(T=2)
    tissue.track_cells()
    X.export_segmentation_to_matlab(tissue, str(tmp_path), "seg")
    assert os.path.exists(os.path.join(tmp_path, "seg.mat"))
    from scipy.io import loadmat
    m = loadmat(os.path.join(tmp_path, "seg.mat"))
    assert "frame1" in m and m["frame1"].max() > 0

    X.export_segmentation_to_tiff(tissue, str(tmp_path), "seg_t")
    assert os.path.exists(os.path.join(tmp_path, "seg_t.tif"))
    X.export_segmentation_and_cell_types_to_tiff(tissue, str(tmp_path), "segty")
    assert os.path.exists(os.path.join(tmp_path, "segty.tif"))
    X.export_segmentation_to_npy(tissue, str(tmp_path), "seg_n")
    arr = np.load(os.path.join(tmp_path, "seg_n.npy"))
    assert arr.shape[0] == 2

    tissue.data_path = os.path.join(tmp_path, "movie.tif")
    X.save_frame_data_for_simulation(tissue, 1, str(tmp_path))
    assert os.path.exists(os.path.join(tmp_path, "movie_labels_frame_1.npy"))
    import pandas as pd
    df = pd.read_pickle(os.path.join(tmp_path, "movie_cells_info_frame_1"))
    assert "cell_id" in df.columns and "edge_cell" in df.columns


def test_overlays():
    tissue = make_tissue(T=2)
    tissue.track_cells()
    tissue.type_names = ["HC"]
    lab = tissue.get_labels(1)
    marker = np.ones(lab.shape, np.float32)
    marker[lab == 15] = 1000.0
    tissue.calc_cell_types(marker, 1, "HC", threshold=0.3)
    img = V.draw_cell_types(tissue, 1, "HC")
    assert img.shape == (3,) + lab.shape
    assert img.max() > 0
    track_img = V.draw_all_cell_tracking(tissue, 1)
    assert track_img.shape == (3,) + lab.shape
    single = V.draw_cell_tracking(tissue, 1, int(np.asarray(
        tissue.get_cells_info(1).label)[14]))
    assert single.sum() > 0
    tissue.add_event("ablation", 1, 2, start_pos=(
        int(np.asarray(tissue.get_cells_info(1).cx)[14]),
        int(np.asarray(tissue.get_cells_info(1).cy)[14])))
    ev_img = V.draw_events(tissue, 1)
    assert ev_img.sum() > 0
    conn = V.draw_neighbors_connections(tissue, 1)
    assert conn.sum() > 0


def test_frame_data_dispatch():
    from tissue_image_processing_tpu.core.frame_data import get_frame_data
    tissue = make_tissue(T=1)
    tissue.type_names = ["HC"]
    lab = tissue.get_labels(1)
    marker = np.ones(lab.shape, np.float32)
    marker[lab == 15] = 1000.0
    tissue.calc_cell_types(marker, 1, "HC", threshold=0.3)
    mask = tissue.get_valid_non_edge_mask(1)
    for feature in ["area", "roundness", "shape index", "HC neighbors",
                    "SC neighbors", "second neighbors", "contact length",
                    "HC contact length", "n_neighbors", "psi6"]:
        data, msg = get_frame_data(tissue, 1, feature, mask)
        assert data is not None, feature
        assert len(np.atleast_1d(data)) == mask.sum(), feature
    for feature in ["density", "type_fraction", "total_area", "number_of_cells",
                    "neighbors correlation"]:
        data, msg = get_frame_data(tissue, 1, feature, mask)
        assert np.isscalar(data) or isinstance(data, (int, float)), feature
    df, _ = get_frame_data(tissue, 1, "neighbors by type", mask)
    assert "HC" in df.columns
