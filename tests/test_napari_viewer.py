"""TissueViewer click-dispatch exercised end-to-end against a stubbed napari
(VERDICT r2 item 7): the add-line / remove-line / change-type / mark-event
click modes must mutate labels/types/events identically to calling
core/editing.py directly (reference click dispatch: gui.py:776-839)."""
import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
from tissue_image_processing_tpu.core.editing import SegmentationEditor
from tissue_image_processing_tpu.core.tissue import Tissue


class _FakeLayerList(list):
    def __contains__(self, name):
        return any(l.name == name for l in self)

    def remove(self, name):
        for l in list(self):
            if l.name == name:
                super().remove(l)


class _FakeLayer:
    def __init__(self, data, name, **kwargs):
        self.data = data
        self.name = name
        self.kwargs = kwargs


class _FakeViewer:
    def __init__(self, title=""):
        self.title = title
        self.layers = _FakeLayerList()
        self.mouse_drag_callbacks = []

    def _add(self, data, name=None, **kwargs):
        self.layers.append(_FakeLayer(data, name, **kwargs))

    add_image = add_labels = add_points = _add


class _FakeEvent:
    def __init__(self, y, x):
        self.type = "mouse_press"
        self.position = (float(y), float(x))


@pytest.fixture
def fake_napari(monkeypatch):
    mod = types.ModuleType("napari")
    mod.Viewer = _FakeViewer
    monkeypatch.setitem(sys.modules, "napari", mod)
    return mod


def _two_cell_tissue(tmp_path, tag):
    t = Tissue(1, os.path.join(str(tmp_path), f"{tag}.tif"),
               channel_names=["zo"], capacity=32)
    labels = np.zeros((64, 64), np.int32)
    labels[:, :31] = 1
    labels[:, 32:] = 2
    labels[:, 31] = 0  # 1-px watershed line between the two cells
    t.set_labels(1, labels)
    t.set_cells_info(1, frame_cellinfo(jnp.asarray(labels), capacity=32))
    types_map = np.zeros((64, 64), np.uint8)
    t.set_cell_types(1, types_map)
    return t


def _make_viewer(t):
    from tissue_image_processing_tpu.viz.napari_viewer import TissueViewer
    img = np.zeros((1, 1, 64, 64), np.float32)
    return TissueViewer(t, images=img, frame=1)


def _click(v, y, x):
    """Drive the viewer through its registered napari mouse callback."""
    assert len(v.viewer.mouse_drag_callbacks) == 1
    v.viewer.mouse_drag_callbacks[0](v.viewer, _FakeEvent(y, x))


def test_cli_view_opens_viewer_and_saves(fake_napari, tmp_path):
    """`cli view` is the product entry to the viewer (the reference's main
    window): it builds the layers over the session and persists on close."""
    from tissue_image_processing_tpu.cli import main

    fake_napari.run = lambda: None  # headless: "window" closes immediately
    movie = np.zeros((2, 1, 1, 64, 64), np.float32)
    mp = os.path.join(str(tmp_path), "m.npy")
    np.save(mp, movie)
    session = os.path.join(str(tmp_path), "v.seg")
    # seed the session with labels via the segment command
    t = _two_cell_tissue(tmp_path, "cliview")
    for _ in t.save(session):
        pass
    assert main(["view", mp, "--session", session, "--capacity", "32",
                 "--frame", "1"]) == 0
    assert os.path.exists(session)


def test_viewer_builds_layers(fake_napari, tmp_path):
    v = _make_viewer(_two_cell_tissue(tmp_path, "a"))
    names = [l.name for l in v.viewer.layers]
    assert "segmentation" in names and "cell types" in names and "zo" in names


def test_add_line_clicks_match_direct_editor(fake_napari, tmp_path):
    tv = _two_cell_tissue(tmp_path, "v")
    td = _two_cell_tissue(tmp_path, "d")
    v = _make_viewer(tv)
    v.mode = "add_line"
    _click(v, 0, 16)    # event.position is (y, x); handle_click gets (x, y)
    _click(v, 63, 16)
    ed = SegmentationEditor(td)
    ed.add_segmentation_line(1, (16, 0), (16, 63), initial=True, final=True)
    np.testing.assert_array_equal(tv.get_labels(1), td.get_labels(1))
    assert tv.get_labels(1).max() > 2  # the cell actually split
    # the viewer refreshed its labels layer with the post-edit map
    seg = [l for l in v.viewer.layers if l.name == "segmentation"][0]
    np.testing.assert_array_equal(seg.data, tv.get_labels(1))


def test_remove_line_clicks_match_direct_editor(fake_napari, tmp_path):
    tv = _two_cell_tissue(tmp_path, "v")
    td = _two_cell_tissue(tmp_path, "d")
    v = _make_viewer(tv)
    v.mode = "remove_line"
    _click(v, 32, 31)   # on the vertical boundary
    ed = SegmentationEditor(td)
    ed.remove_segmentation_line(1, (31, 32))
    np.testing.assert_array_equal(tv.get_labels(1), td.get_labels(1))
    # the two cells merged
    lab = tv.get_labels(1)
    assert len(np.unique(lab[lab > 0])) == 1


def test_change_type_click_matches_direct_editor(fake_napari, tmp_path):
    tv = _two_cell_tissue(tmp_path, "v")
    td = _two_cell_tissue(tmp_path, "d")
    v = _make_viewer(tv)
    v.mode = "change_type"
    v.type_name = "HC"
    _click(v, 30, 10)   # inside cell 1
    SegmentationEditor(td).change_cell_type(1, (10, 30), "HC")
    np.testing.assert_array_equal(np.asarray(tv.get_cells_info(1).type),
                                  np.asarray(td.get_cells_info(1).type))


def test_mark_event_click_adds_event(fake_napari, tmp_path):
    tv = _two_cell_tissue(tmp_path, "v")
    v = _make_viewer(tv)
    v.mode = "mark_event"
    v.event_type = "division"
    _click(v, 20, 10)
    ev = tv.events
    assert len(ev) == 1
    assert ev.iloc[0]["type"] == "division"
    assert (ev.iloc[0]["start_pos_x"], ev.iloc[0]["start_pos_y"]) == (10, 20)
    # the refresh added an events points layer
    assert any(l.name == "events" for l in v.viewer.layers)


def test_viewer_undo_restores_labels(fake_napari, tmp_path):
    tv = _two_cell_tissue(tmp_path, "v")
    before = tv.get_labels(1).copy()
    v = _make_viewer(tv)
    v.mode = "add_line"
    _click(v, 0, 16)
    _click(v, 63, 16)
    assert tv.get_labels(1).max() > 2
    v.undo()
    np.testing.assert_array_equal(tv.get_labels(1), before)
