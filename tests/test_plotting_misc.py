import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from test_tissue import make_tissue
from tissue_image_processing_tpu.core import plotting as P


@pytest.fixture
def tracked_tissue():
    tissue = make_tissue(T=4)
    tissue.track_cells()
    tissue.type_names = ["HC"]
    for f in range(1, 5):
        lab = tissue.get_labels(f)
        marker = np.ones(lab.shape, np.float32)
        marker[lab == 15] = 1000.0
        tissue.calc_cell_types(marker, f, "HC", threshold=0.3)
    return tissue


def test_single_cell_data(tracked_tissue):
    t = tracked_tissue
    cid = int(np.asarray(t.get_cells_info(1).label)[14])
    fig, ax = plt.subplots()
    df = P.plot_single_cell_data(t, cid, "area", ax)
    assert len(df) == 4
    assert (df["area"] > 0).all()
    plt.close(fig)


def test_single_frame_plot(tracked_tissue):
    fig, ax = plt.subplots()
    res, msg = P.plot_single_frame_data(tracked_tissue, 1, "area", "roundness", ax)
    assert res is not None and len(res) > 0
    res2, _ = P.plot_single_frame_data(tracked_tissue, 1, "area", "histogram", ax)
    assert "area" in res2.columns
    plt.close(fig)


def test_compare_frames_plot(tracked_tissue):
    fig, ax = plt.subplots()
    res, msg = P.plot_compare_frames_data(tracked_tissue, [1, 2, 3], "area", ax)
    assert len(res) == 3
    plt.close(fig)


def test_spatial_map_plot(tracked_tissue):
    fig, ax = plt.subplots()
    m, msg = P.plot_spatial_map(tracked_tissue, 1, "HC type_fraction", 20, 16, ax)
    assert m is not None and m.shape == (64, 64)
    plt.close(fig)


def test_event_related_plot(tracked_tissue):
    t = tracked_tissue
    cid = int(np.asarray(t.get_cells_info(1).label)[14])
    cx = float(np.asarray(t.get_cells_info(2).cx)[14])
    cy = float(np.asarray(t.get_cells_info(2).cy)[14])
    t.add_event("ablation", 2, 3, start_pos=(int(cx), int(cy)))
    fig, ax = plt.subplots()
    df = P.plot_event_related_data(t, cid, 2, "area", 2, ax)
    assert df is not None and len(df) > 0
    plt.close(fig)


def test_tissue_misc_api(tracked_tissue):
    t = tracked_tissue
    names = t.get_cell_type_names()
    assert "('HC-pos',)" in names and "all" in names
    cell = t.get_cell_by_pixel(5, 5, 1)
    assert cell and cell["area"] > 0
    feats = t.get_cells_features(1)
    assert "roundness" in feats and "area" in feats
    vf = t.find_valid_frames(1, 10)
    assert vf.tolist() == [1, 2, 3]


def test_fix_cell_label_and_events(tracked_tissue):
    t = tracked_tissue
    lab1 = np.asarray(t.get_cells_info(1).label)
    old = int(lab1[14])
    labels = t.get_labels(1)
    ys, xs = np.nonzero(labels == 15)
    t.fix_cell_label(1, (xs[0], ys[0]), 999)
    assert int(np.asarray(t.get_cells_info(1).label)[14]) == 999
    # propagated to subsequent frames
    assert int(np.asarray(t.get_cells_info(2).label)[14]) == 999
    # event fixups run
    t.add_event("delamination", 1, 2, start_pos=(int(xs[0]), int(ys[0])))
    t.fix_cell_pos_in_events()
    t.fix_cell_id_in_events()
    assert int(t.events.iloc[-1].cell_id) == 999
    t.find_events_frame()


def test_fix_one_frame_tracking(tracked_tissue):
    import dataclasses
    import jax.numpy as jnp
    t = tracked_tissue
    # corrupt frame 3+ tracking: shuffle labels
    for f in (3, 4):
        tab = t.get_cells_info(f)
        ids = np.asarray(tab.label).copy()
        m = np.asarray(tab.valid_mask())
        rows = np.nonzero(m)[0]
        ids[rows] = ids[np.roll(rows, 1)]
        t.set_cells_info(f, dataclasses.replace(tab, label=jnp.asarray(ids)))
    before = np.asarray(t.get_cells_info(3).label)[14]
    t.fix_one_frame_tracking_using_local_drifts(2, 3)
    after3 = int(np.asarray(t.get_cells_info(3).label)[14])
    after2 = int(np.asarray(t.get_cells_info(2).label)[14])
    assert after3 == after2  # relinked to the frame-2 id (same position)
    # propagated forward consistently
    after4 = int(np.asarray(t.get_cells_info(4).label)[14])
    assert after4 == after3 or after4 > 0


def test_napari_layer_specs_without_napari(tmp_path):
    """build_layer_specs is pure data prep — works with napari absent."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from tissue_image_processing_tpu.core.tissue import Tissue
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    from tissue_image_processing_tpu.core.events import add_event
    from tissue_image_processing_tpu.viz.napari_viewer import (
        build_layer_specs, napari_available, scale_zchannel)

    t = Tissue(2, os.path.join(str(tmp_path), "v.tif"), channel_names=["zo", "atoh"],
               capacity=32)
    rng = np.random.default_rng(0)
    labels = np.zeros((64, 64), np.int32)
    labels[4:20, 4:20] = 1
    labels[30:50, 30:50] = 2
    t.set_labels(1, labels)
    t.set_cells_info(1, frame_cellinfo(jnp.asarray(labels), capacity=32))
    add_event(t, "division", 1, 1, start_pos=(10, 10), end_pos=(10, 10))
    img = rng.random((2, 64, 64)).astype(np.float32)
    specs = build_layer_specs(t, 1, image=img)
    kinds = [s["kind"] for s in specs]
    names = [s["name"] for s in specs]
    assert kinds.count("image") == 2 and "labels" in kinds and "points" in kinds
    assert "zo" in names and "segmentation" in names
    ev = [s for s in specs if s["kind"] == "points"][0]
    assert ev["data"].shape == (1, 2)

    # scale_zchannel operates on a duck-typed viewer (no napari import)
    class L:
        def __init__(self, shape):
            self.data = np.zeros(shape)
            self.scale = None

    class V:
        layers = [L((3, 8, 16, 16)), L((16, 16))]

    v = V()
    assert scale_zchannel(v, 2.5) == 1
    assert v.layers[0].scale == [1, 2.5, 1, 1]

    if not napari_available():
        import pytest
        from tissue_image_processing_tpu.viz.napari_viewer import TissueViewer
        with pytest.raises(ImportError):
            TissueViewer(t)


def test_save_figure_with_data(tmp_path):
    import os
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import pandas as pd
    from tissue_image_processing_tpu.core.plotting import save_figure_with_data

    fig, ax = plt.subplots()
    df = pd.DataFrame({"frame": [1, 2], "area": [10.0, 11.0]})
    ax.plot(df["frame"], df["area"])
    p = os.path.join(str(tmp_path), "plot.png")
    data_path = save_figure_with_data(fig, p, df)
    assert os.path.isfile(p) and data_path.endswith("_data.csv")
    back = pd.read_csv(data_path, index_col=0)
    assert back["area"].tolist() == [10.0, 11.0]
    # dict -> pickle
    d2 = save_figure_with_data(fig, os.path.join(str(tmp_path), "p2.png"),
                               {"k": 1})
    assert d2.endswith("_data.pkl")
    plt.close(fig)
