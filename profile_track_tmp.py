import time, sys
import numpy as np
import jax, jax.numpy as jnp
from bench import make_movie
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
from tissue_image_processing_tpu.core.tracking import compute_drift_chain, track_movie
from tissue_image_processing_tpu.ops.watershed import watershed_segmentation
from tissue_image_processing_tpu.projection.surface import time_point_surface_projection

T, Z, H, W = 4, 30, 1024, 1024
cap = 2048
movie = make_movie(T, Z, H, W)
print("movie built", flush=True)

def one_frame(stack):
    proj, zmap = time_point_surface_projection(stack, reference_channel=0, airyscan=False)
    labels = watershed_segmentation(proj[0], 0.2, 3.0, 101)
    table = frame_cellinfo(labels, capacity=cap)
    return proj[0], table.cy, table.cx, table.area, table.valid_mask()

pipe1 = jax.jit(one_frame)
t0=time.time()
out = pipe1(jnp.asarray(movie[0])); np.asarray(out[1][:1])
print("pipe1 compile+run: %.1fs" % (time.time()-t0), flush=True)
t0=time.time()
outs = [pipe1(jnp.asarray(movie[t])) for t in range(T)]
np.asarray(outs[-1][1][:1])
dt = time.time()-t0
print("pipe1 warm x%d: %.2fs -> %.0f ms/frame" % (T, dt, dt/T*1000), flush=True)

projs = jnp.stack([o[0] for o in outs])
cys = jnp.stack([o[1] for o in outs]); cxs = jnp.stack([o[2] for o in outs])
areas = jnp.stack([o[3] for o in outs]); masks = jnp.stack([o[4] for o in outs])

drift_fn = jax.jit(compute_drift_chain)
t0=time.time(); d = drift_fn(projs); np.asarray(d[:1]); print("drift compile+run: %.1fs" % (time.time()-t0), flush=True)
t0=time.time(); d = drift_fn(projs); np.asarray(d[:1]); print("drift warm: %.2fs" % (time.time()-t0), flush=True)

track_fn = jax.jit(lambda cy,cx,a,m,dr: track_movie(cy,cx,a,m,drifts=dr,capacity=2*cap))
t0=time.time(); ids = track_fn(cys,cxs,areas,masks,d); np.asarray(ids[:1,:1]); print("track compile+run: %.1fs" % (time.time()-t0), flush=True)
t0=time.time(); ids = track_fn(cys,cxs,areas,masks,d); np.asarray(ids[:1,:1]); print("track warm (%d frames): %.2fs" % (T, time.time()-t0), flush=True)
print("DONE", flush=True)
