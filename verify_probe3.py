"""Verify probe: minima escape-fold + relabel_roots + 2-scatter regionprops on TPU."""
import numpy as np, jax, jax.numpy as jnp
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)
from scipy import ndimage as ndi
import importlib
WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
from tissue_image_processing_tpu.ops.regionprops import regionprops

rng = np.random.default_rng(7)
img = ndi.gaussian_filter(rng.random((1024, 1024)).astype(np.float32), 6.0)
ji = jnp.asarray(img)

# probe 1: pallas minima (escape-fold) vs pinned XLA minima — must agree exactly
a = np.asarray(WS.regional_minima_labels(ji, use_pallas=True))
b = np.asarray(WS.regional_minima_labels(ji, use_pallas=False))
print("minima pallas-vs-xla exact:", (a == b).all(), "n_minima:", a.max(), flush=True)

# probe 2: full watershed pallas vs XLA after the refactor
wa = np.asarray(WS.watershed(ji, use_pallas=True))
wb = np.asarray(WS.watershed(ji, use_pallas=False))
print("watershed pallas-vs-xla agreement:", (wa == wb).mean(), flush=True)

# probe 3: regionprops 2-scatter on the real watershed output vs numpy oracle
props = {k: np.asarray(v) for k, v in regionprops(jnp.asarray(wa), 2048).items()}
labs = np.unique(wa); labs = labs[labs > 0]
pick = labs[np.linspace(0, len(labs) - 1, 6).astype(int)]
ok = True
import math
for l in pick:
    m = wa == l
    ys, xs = np.nonzero(m)
    ok &= props["area"][l] == m.sum()
    ok &= abs(props["cy"][l] - ys.mean()) < 1e-4
    ok &= props["bbox_max_col"][l] == xs.max() + 1 and props["bbox_min_row"][l] == ys.min()
print("regionprops exact on watershed labels:", bool(ok), "cells:", len(labs), flush=True)

# probe 4 (perimeter int-encoding): vs skimage-style weighted oracle on one cell
def perimeter_oracle(mask):
    from scipy.ndimage import binary_erosion
    er = binary_erosion(mask, np.array([[0,1,0],[1,1,1],[0,1,0]]), border_value=0)
    border = mask & ~er
    code = border.astype(np.int32).copy()
    H, W = mask.shape
    for dy, dx in ((1,0),(-1,0),(0,1),(0,-1)):
        nb = np.zeros_like(border)
        ys, xs = np.nonzero(border)
        y2, x2 = ys + dy, xs + dx
        s = (y2 >= 0) & (y2 < H) & (x2 >= 0) & (x2 < W)
        nb[ys[s], xs[s]] = border[y2[s], x2[s]]
        code += 2 * (nb & border)
    for dy, dx in ((1,1),(1,-1),(-1,1),(-1,-1)):
        nb = np.zeros_like(border)
        ys, xs = np.nonzero(border)
        y2, x2 = ys + dy, xs + dx
        s = (y2 >= 0) & (y2 < H) & (x2 >= 0) & (x2 < W)
        nb[ys[s], xs[s]] = border[y2[s], x2[s]]
        code += 10 * (nb & border)
    w = np.zeros(50); w[[5,7,15,17,25,27]] = 1; w[[21,33]] = math.sqrt(2)
    w[[13,23]] = (1 + math.sqrt(2)) / 2
    return w[np.clip(code, 0, 49)][border].sum()
l = int(pick[2])
m = wa == l
want = perimeter_oracle(m)
got = float(props["perimeter"][l])
print("perimeter int-encoded vs oracle:", got, want, "diff:", abs(got - want), flush=True)
print("VERIFY_DONE", flush=True)
