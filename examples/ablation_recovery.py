"""Ablation-ring recovery analysis.

Parametrized rebuild of the reference's ablation analyses
(``combine_results.py:132-344``): per-frame circle/ellipse fits of the ablation ring
(from shape-fitting results stored in the session), exponential recovery curve fit,
and recoil-speed extraction from circular ablations
(``tissue_info.py:4096-4122``).
"""

from __future__ import annotations

import argparse
import json

import numpy as np
from scipy.optimize import curve_fit


def exponential_recovery(t, a, tau, c):
    return a * np.exp(-t / tau) + c


def fit_recovery(times: np.ndarray, radii: np.ndarray):
    """Exponential fit of ring radius over time (``combine_results.py:132-344``)."""
    p0 = (radii[0] - radii[-1], max((times[-1] - times[0]) / 3, 1e-3), radii[-1])
    params, cov = curve_fit(exponential_recovery, times, radii, p0=p0, maxfev=10000)
    return {"amplitude": params[0], "tau": params[1], "offset": params[2],
            "stderr": np.sqrt(np.diagonal(cov)).tolist()}


def recoil_speed_from_circular_ablation(tissue, shape_name: str,
                                        first_frame: int, last_frame: int):
    """Radial recoil of cells inside a fitted ablation circle (reference
    ``calc_recoil_speed_from_circular_ablation``, ``tissue_info.py:4096-4122``)."""
    import pandas as pd

    circle = tissue.shape_fitting_results[last_frame - 1][shape_name]
    cx0, cy0, r = circle["x_center"][0], circle["y_center"][0], circle["radius"][0]
    t_last = tissue.get_cells_info(last_frame)
    t_first = tissue.get_cells_info(first_frame)
    m_last = tissue.get_valid_non_edge_mask(last_frame)
    m_first = tissue.get_valid_non_edge_mask(first_frame)
    last_ids = np.asarray(t_last.label)
    first_ids = np.asarray(t_first.label)
    inside = m_last & (((np.asarray(t_last.cx) - cx0) ** 2
                        + (np.asarray(t_last.cy) - cy0) ** 2) < r ** 2)
    rows = []
    for i in np.nonzero(inside)[0]:
        cid = last_ids[i]
        j = np.nonzero(m_first & (first_ids == cid))[0]
        if not j.size:
            continue
        j = j[0]
        mx = float(np.asarray(t_last.cx)[i] - np.asarray(t_first.cx)[j])
        my = float(np.asarray(t_last.cy)[i] - np.asarray(t_first.cy)[j])
        tx = cx0 - float(np.asarray(t_last.cx)[i])
        ty = cy0 - float(np.asarray(t_last.cy)[i])
        d = np.hypot(tx, ty) or 1.0
        rows.append({"cell_id": int(cid), "movement_x": mx, "movement_y": my,
                     "to_center_x": tx, "to_center_y": ty, "dist_to_center": d})
    df = pd.DataFrame(rows)
    if not len(df):
        return df
    df["movement_x"] -= df["movement_x"].mean()
    df["movement_y"] -= df["movement_y"].mean()
    df["radial_movement"] = (df.movement_x * df.to_center_x
                             + df.movement_y * df.to_center_y) / df.dist_to_center
    return df


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="JSON: {'times': [...], 'radii': [...]}")
    args = p.parse_args(argv)
    with open(args.config) as f:
        cfg = json.load(f)
    res = fit_recovery(np.asarray(cfg["times"], float),
                       np.asarray(cfg["radii"], float))
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
