"""Test configuration: run everything on a virtual 8-device CPU mesh so sharding paths
are exercised without TPU hardware (the driver separately dry-runs multi-chip)."""

import os

# The image exports JAX_PLATFORMS=axon (the TPU plugin) which overrides shell
# prefixes, so pin the CPU platform through the config API as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"

# Persist compiled executables across test runs: the suite's cost is dominated
# by XLA CPU compiles of the big Pallas-path/sharded programs (10-50 s each),
# and the persistent cache works for the CPU backend too. First run warms the
# cache (.jax_cache_tests/, gitignored); reruns skip every unchanged compile.
from tissue_image_processing_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), ".jax_cache_tests"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_cell_image(h=128, w=128, n_seeds=20, seed=0, sigma=2.0):
    """Synthetic membrane image: bright ridges between Voronoi-ish cells."""
    r = np.random.default_rng(seed)
    pts = np.stack([r.uniform(0, h, n_seeds), r.uniform(0, w, n_seeds)], axis=1)
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2)
    d.sort(axis=-1)
    ridge = np.exp(-((d[..., 1] - d[..., 0]) ** 2) / (2 * sigma ** 2))
    img = ridge + 0.02 * r.standard_normal((h, w))
    img = np.clip(img, 0, None)
    return (img * 60000).astype(np.float32)


def make_cell_labels(h=128, w=128, n_seeds=20, seed=0):
    """Synthetic watershed-style label map: Voronoi cells with 1-px zero lines."""
    r = np.random.default_rng(seed)
    pts = np.stack([r.uniform(0, h, n_seeds), r.uniform(0, w, n_seeds)], axis=1)
    yy, xx = np.mgrid[0:h, 0:w]
    d = (yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2
    lab = d.argmin(axis=-1).astype(np.int32) + 1
    lines = (np.abs(np.diff(lab, axis=0, prepend=lab[:1])) > 0) | \
            (np.abs(np.diff(lab, axis=1, prepend=lab[:, :1])) > 0)
    return np.where(lines, 0, lab).astype(np.int32)


@pytest.fixture
def cell_image():
    return make_cell_image()
