"""Verify probe: projection + regionprops, TPU vs CPU numeric parity through public API."""
import numpy as np, jax, jax.numpy as jnp
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)
from scipy import ndimage as ndi
from tissue_image_processing_tpu.projection.surface import time_point_surface_projection
from tissue_image_processing_tpu.ops.regionprops import regionprops
from tissue_image_processing_tpu.ops.percentile import masked_percentile

rng = np.random.default_rng(5)
yy, xx = np.mgrid[0:512, 0:512]
depth = 4 + 3 * np.sin(yy / 37.0) * np.cos(xx / 53.0)
stack = np.zeros((2, 12, 512, 512), np.float32)
for z in range(12):
    w = np.exp(-((z - depth) ** 2) / 2.0)
    stack[0, z] = w * (4000 + 2000 * rng.random((512, 512))) + 100
    stack[1, z] = w * 1000 + 50
sj = jnp.asarray(stack)

proj, zmap = time_point_surface_projection(sj, reference_channel=0, airyscan=False)
proj, zmap = np.asarray(proj), np.asarray(zmap)
print("zmap range:", zmap.min(), zmap.max(), "median |z-depth|:",
      float(np.median(np.abs(zmap - depth))), flush=True)

# percentile probe: TPU bisection vs numpy on the real volume (fast path >= 2^18)
v = stack[0]
got = float(masked_percentile(jnp.asarray(v), jnp.asarray(v > 0), 95.0))
want = float(np.percentile(v[v > 0], 95.0))
print("p95 tpu vs numpy:", got, want, "rel err:", abs(got - want) / want, flush=True)

# regionprops probe: scatter-based on TPU vs numpy oracle
side = 32
ids = np.arange(1, (512 // side) ** 2 + 1).reshape(512 // side, -1)
lbl = np.kron(ids, np.ones((side, side), np.int32))
lbl[::side] = 0  # carve lines so regions are not exact squares
props = {k: np.asarray(val) for k, val in regionprops(
    jnp.asarray(lbl), int(lbl.max()), intensity=jnp.asarray(v[0])).items()}
ok = True
for l in (1, 7, 100, int(lbl.max())):
    m = lbl == l
    ys, xs = np.nonzero(m)
    ok &= props["area"][l] == m.sum()
    ok &= abs(props["cy"][l] - ys.mean()) < 1e-3 and abs(props["cx"][l] - xs.mean()) < 1e-3
    ok &= props["bbox_min_row"][l] == ys.min() and props["bbox_max_row"][l] == ys.max() + 1
    ok &= props["bbox_min_col"][l] == xs.min() and props["bbox_max_col"][l] == xs.max() + 1
    ok &= abs(props["mean_intensity"][l] - v[0][m].mean()) < 1e-2
print("regionprops exact vs numpy oracle:", bool(ok), flush=True)

# probe: empty mask -> percentile returns 0, no NaN
e = float(masked_percentile(jnp.asarray(v), jnp.zeros_like(jnp.asarray(v), dtype=bool), 95.0))
print("empty-mask percentile:", e, flush=True)
print("VERIFY_DONE", flush=True)
