import time
import numpy as np
import jax, jax.numpy as jnp
from bench import make_movie
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
from tissue_image_processing_tpu.ops.watershed import watershed_segmentation, regional_minima_labels, watershed
from tissue_image_processing_tpu.ops.local_threshold import threshold_local_max
from tissue_image_processing_tpu.ops.filters import gaussian_blur
from tissue_image_processing_tpu.projection.surface import time_point_surface_projection

Z, H, W = 30, 1024, 1024
cap = 2048
movie = make_movie(1, Z, H, W)
stack = jnp.asarray(movie[0])
print("movie built", flush=True)

def timeit(name, f, *a, n=4):
    t0=time.time(); r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print("%s compile+1st: %.1fs" % (name, time.time()-t0), flush=True)
    t0=time.time()
    for _ in range(n): r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print("%s warm: %.0f ms" % (name, (time.time()-t0-0.027)/n*1000), flush=True)
    return r

proj, zmap = timeit("projection", jax.jit(lambda s: time_point_surface_projection(s, reference_channel=0, airyscan=False)), stack)
img = proj[0]
timeit("thr_local", jax.jit(lambda x: threshold_local_max(x, 101)), img)
timeit("blur3", jax.jit(lambda x: gaussian_blur(x, 3.0)), img)
timeit("reg_minima", regional_minima_labels, img)
lab = timeit("watershed_seg", jax.jit(lambda x: watershed_segmentation(x, 0.2, 3.0, 101)), img)
timeit("frame_cellinfo", jax.jit(lambda l: frame_cellinfo(l, capacity=cap)), lab)
print("DONE", flush=True)
