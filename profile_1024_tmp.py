import time, numpy as np, jax, jax.numpy as jnp
from tissue_image_processing_tpu.ops.watershed import watershed_segmentation, regional_minima_labels
from tissue_image_processing_tpu.ops.local_threshold import threshold_local_max
from tissue_image_processing_tpu.ops.filters import gaussian_blur
from tissue_image_processing_tpu.ops.regionprops import regionprops
from tissue_image_processing_tpu.ops.neighbors import adjacency_matrix
from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
from tissue_image_processing_tpu.projection.surface import time_point_surface_projection

rng = np.random.default_rng(1)
H = W = 1024
from scipy.spatial import cKDTree
pts = np.stack([rng.uniform(0, H, 1000), rng.uniform(0, W, 1000)], 1)
yy, xx = np.mgrid[0:H, 0:W]
d, _ = cKDTree(pts).query(np.stack([yy.ravel(), xx.ravel()],1), k=2)
img = jnp.asarray((np.exp(-((d[:,1]-d[:,0])**2)/8.0).reshape(H,W) * 50000).astype(np.float32))

def timeit(name, f, *a, n=5):
    t0 = time.time()
    r = f(*a); s = jax.tree.leaves(r)[0]; np.asarray(s.ravel()[:1])
    print(f"{name}: compile+1st {time.time()-t0:.1f}s", flush=True)
    t = time.time()
    for _ in range(n):
        r = f(*a)
    s = jax.tree.leaves(r)[0]
    np.asarray(s.ravel()[:1])
    dt = (time.time()-t - 0.027)/n*1000
    print(f"{name}: {dt:.0f} ms", flush=True)

timeit("thr_local 101", jax.jit(lambda x: threshold_local_max(x, 101)), img)
timeit("blur s3", jax.jit(lambda x: gaussian_blur(x, 3.0)), img)
timeit("blur s30 2d", jax.jit(lambda x: gaussian_blur(x, 30.0)), img)
timeit("reg_minima", regional_minima_labels, img)
timeit("watershed_seg", jax.jit(lambda x: watershed_segmentation(x, 0.2, 3.0, 101)), img)
lab = watershed_segmentation(img, 0.2, 3.0, 101)
timeit("regionprops", jax.jit(lambda l: regionprops(l, num_labels=4096)), lab)
timeit("adjacency", jax.jit(lambda l: adjacency_matrix(l, num_labels=4096)), lab)
timeit("frame_cellinfo", jax.jit(lambda l: frame_cellinfo(l, capacity=4096)), lab)
stack = jnp.asarray(rng.random((2, 30, 1024, 1024)).astype(np.float32)*1000)
timeit("projection 30z", jax.jit(lambda s: time_point_surface_projection(s, reference_channel=0, airyscan=False)), stack, n=3)
print("DONE", flush=True)
