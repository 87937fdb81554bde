"""Verify probe: pallas blur gate fallback + vmap value parity on TPU."""
import numpy as np, jax, jax.numpy as jnp
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)
import tissue_image_processing_tpu.ops.filters as F

rng = np.random.default_rng(0)
# probe A: unsupported shape (X % 128 != 0) -> XLA fallback, no crash
small = jnp.asarray(rng.random((48, 48)).astype(np.float32))
out = np.asarray(F.gaussian_blur(small, 2.0))
from scipy import ndimage as ndi
want = ndi.gaussian_filter(np.asarray(small), 2.0, mode="nearest")
print("48x48 fallback max rel err:", float(np.abs(out - want).max() / want.max()), flush=True)

# probe B: vmap(B=2) pallas blur values == per-frame values
vol = jnp.asarray((rng.random((8, 256, 256)) * 100).astype(np.float32))
batch = jnp.stack([vol, vol * 2.0])
f = jax.jit(jax.vmap(lambda v: F.gaussian_blur(v, (0.5, 1.0, 1.0))))
got = np.asarray(f(batch))
single = np.asarray(F.gaussian_blur(vol, (0.5, 1.0, 1.0)))
print("vmap-vs-single exact:", np.array_equal(got[0], single),
      np.allclose(got[1], 2.0 * single, rtol=1e-5), flush=True)
print("VERIFY_DONE", flush=True)
