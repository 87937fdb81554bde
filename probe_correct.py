"""On-device correctness bisect: pallas vs XLA per watershed stage."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import make_movie
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

Z, H, W = 30, 1024, 1024
movie = make_movie(1, Z, H, W)
stack = jax.device_put(movie[0].astype(np.uint16))
del movie

import importlib
FP = importlib.import_module("tissue_image_processing_tpu.ops.flood_pallas")
WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
from tissue_image_processing_tpu.ops.filters import gaussian_blur
from tissue_image_processing_tpu.ops.local_threshold import threshold_local_max
from tissue_image_processing_tpu.projection.surface import project_timepoint_auto

proj, _ = jax.jit(lambda s: project_timepoint_auto(
    s, reference_channel=0, airyscan=False))(stack)
surf = jax.jit(lambda p: gaussian_blur(jnp.where(
    p < 0.2 * threshold_local_max(p, 101), 0.0, p), 3.0))(proj[0])

seeds_p = np.asarray(jax.jit(
    lambda s: WS.regional_minima_labels(s, use_pallas=True))(surf))
print("pallas seeds:", seeds_p.max(), "unique:", len(np.unique(seeds_p)) - 1, flush=True)
seeds_x = np.asarray(jax.jit(
    lambda s: WS.regional_minima_labels(s, use_pallas=False))(surf))
print("xla   seeds:", seeds_x.max(), "unique:", len(np.unique(seeds_x)) - 1, flush=True)
print("seed agreement:", (seeds_p == seeds_x).mean(), flush=True)

lab_p = np.asarray(jax.jit(
    lambda s: WS.watershed(s, use_pallas=True))(surf))
lab_x = np.asarray(jax.jit(
    lambda s: WS.watershed(s, use_pallas=False))(surf))
print("pallas labels:", lab_p.max(), " xla labels:", lab_x.max(), flush=True)
print("label agreement:", (lab_p == lab_x).mean(), flush=True)
