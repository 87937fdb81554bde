"""Verify probe: public API, odd shape -> auto XLA fallback; supported shape -> pallas."""
import numpy as np, jax, jax.numpy as jnp, time
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from tissue_image_processing_tpu.ops import watershed, regional_minima_labels
from scipy import ndimage as ndi
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(1)

# probe 1: shape NOT meeting the pallas gate (H % 64 != 0) -> must auto-fallback, not crash
img = ndi.gaussian_filter(rng.random((200, 256)).astype(np.float32), 4.0)
lbl = np.asarray(watershed(jnp.asarray(img), watershed_line=True))
print("odd-shape labels:", lbl.max(), "line px:", int((lbl == 0).sum()), flush=True)

# probe 2: supported small shape on TPU, pallas auto vs pinned XLA must agree exactly
img2 = ndi.gaussian_filter(rng.random((256, 256)).astype(np.float32), 4.0)
a = np.asarray(watershed(jnp.asarray(img2)))                    # auto -> pallas on TPU
b = np.asarray(watershed(jnp.asarray(img2), use_pallas=False))  # pinned XLA
print("256x256 auto-vs-xla agreement:", (a == b).mean(), flush=True)

# probe 3: markers kwarg still honored (pallas settle path with external markers)
mk = np.asarray(regional_minima_labels(jnp.asarray(img2)))
c = np.asarray(watershed(jnp.asarray(img2), markers=jnp.asarray(mk)))
print("external-markers same as auto:", (a == c).all(), flush=True)
print("VERIFY_DONE", flush=True)
