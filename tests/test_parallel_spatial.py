"""("frame", "y") space-axis sharding: parity vs the unsharded projection.

SURVEY §5.8's spatial mesh axis — rows of the raw z-stack shard over ``y``
with a ppermute halo exchange and a psum-distributed exact percentile; the
result must match ``time_point_surface_projection(precise=True)`` exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tissue_image_processing_tpu.parallel.spatial import (
    make_space_mesh, masked_percentile_psum, sharded_projection)
from tissue_image_processing_tpu.projection.surface import (
    time_point_surface_projection)


def _movie(T, C, Z, Y, X, seed=0):
    rng = np.random.default_rng(seed)
    m = (rng.random((T, C, Z, Y, X)) * 5000).astype(np.float32)
    # a z-surface so the argmax structure is nontrivial
    zz = np.arange(Z).reshape(Z, 1, 1)
    depth = Z / 2 + (Z / 4) * np.sin(np.arange(Y) / 17.0).reshape(-1, 1)
    m *= np.exp(-((zz - depth) ** 2))[None, None]
    return m


def test_masked_percentile_psum_matches_global():
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(0)
    x = (rng.random((8, 256)) * 100).astype(np.float32)
    mask = x > 20
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    fn = jax.jit(jax.shard_map(
        lambda xs, ms: masked_percentile_psum(xs, ms, 95.0, "y"),
        mesh=mesh, in_specs=(P("y"), P("y")), out_specs=P(),
        check_vma=False))
    got = float(fn(jnp.asarray(x), jnp.asarray(mask)))
    want = float(np.percentile(x[mask], 95.0))
    assert abs(got - want) < 1e-4, (got, want)


@pytest.mark.parametrize("fshards,yshards", [(2, 4), (1, 8)])
def test_sharded_projection_parity(fshards, yshards):
    """Tiny shapes exercise the all_gather halo fallback (halo 132 > 8-row
    shards); the 1-hop ppermute path is covered by test_halo_exchange_1hop."""
    T, C, Z, Y, X = 2 * fshards, 2, 4, 8 * yshards, 64
    movie = _movie(T, C, Z, Y, X)
    mesh = make_space_mesh(8, frame_shards=fshards)
    fn = sharded_projection(mesh, reference_channel=0, airyscan=False)
    with mesh:
        proj, zmap = fn(jnp.asarray(movie))
    proj, zmap = np.asarray(proj), np.asarray(zmap)
    assert proj.shape == (T, C, Y, X) and zmap.shape == (T, Y, X)
    for t in range(T):
        want_p, want_z = time_point_surface_projection(
            jnp.asarray(movie[t]), reference_channel=0, airyscan=False,
            precise=True)
        np.testing.assert_allclose(proj[t], np.asarray(want_p),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_array_equal(zmap[t], np.asarray(want_z))


@pytest.mark.parametrize("fshards,yshards,xshards", [(1, 4, 2), (2, 2, 2),
                                                     (1, 2, 4)])
def test_sharded_projection_xy_parity(fshards, yshards, xshards):
    """Columns shard over the mesh's x axis too (SURVEY 5.8's planned
    ("frame","y_tile","x_tile")): 2-D spatial split with row+column halos
    must still match the unsharded projection exactly."""
    T, C, Z = 2 * fshards, 2, 4
    Y, X = 8 * yshards, 32 * xshards
    movie = _movie(T, C, Z, Y, X, seed=5)
    mesh = make_space_mesh(8, frame_shards=fshards, x_shards=xshards)
    assert dict(mesh.shape) == {"frame": fshards, "y": yshards, "x": xshards}
    fn = sharded_projection(mesh, reference_channel=0, airyscan=False)
    with mesh:
        proj, zmap = fn(jnp.asarray(movie))
    proj, zmap = np.asarray(proj), np.asarray(zmap)
    for t in range(T):
        want_p, want_z = time_point_surface_projection(
            jnp.asarray(movie[t]), reference_channel=0, airyscan=False,
            precise=True)
        np.testing.assert_allclose(proj[t], np.asarray(want_p),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_array_equal(zmap[t], np.asarray(want_z))


def test_clip_percentile_mirrors_subsampling_above_limit():
    """Above _EXACT_SORT_LIMIT global elements the unsharded masked_percentile
    subsamples strided rows; clip_percentile_sharded must select the same
    global rows so the sharded clip value matches at production sizes too."""
    from jax.sharding import Mesh, PartitionSpec as P

    from tissue_image_processing_tpu.ops.percentile import (_EXACT_SORT_LIMIT,
                                                            masked_percentile)
    from tissue_image_processing_tpu.parallel.spatial import (
        clip_percentile_sharded)

    Z, Y, X = 6, 1024, 768                      # 4.7M > 4.19M limit
    assert Z * Y * X > _EXACT_SORT_LIMIT
    rng = np.random.default_rng(2)
    vol = (rng.random((Z, Y, X)) * 5000).astype(np.float32)
    want = float(masked_percentile(jnp.asarray(vol), jnp.asarray(vol > 0),
                                   95.0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    fn = jax.jit(jax.shard_map(
        lambda v: clip_percentile_sharded(v, v > 0, 95.0, "y"),
        mesh=mesh, in_specs=P(None, "y", None), out_specs=P(),
        check_vma=False))
    got = float(fn(jnp.asarray(vol)))
    assert got == want, (got, want)


def test_halo_exchange_1hop():
    """halo <= shard rows -> the ppermute path; parity on a 1-D blur."""
    from jax.sharding import Mesh, PartitionSpec as P

    from tissue_image_processing_tpu.parallel.spatial import (
        _halo_exchange_rows)

    rng = np.random.default_rng(1)
    x = rng.random((1, 64, 32)).astype(np.float32)  # (C, Y, X), 8 rows/shard
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    halo = 5

    def fn(xs):
        ext = _halo_exchange_rows(xs, halo, "y")
        return ext

    ext = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=P(None, "y", None),
                                out_specs=P(None, "y", None),
                                check_vma=False))(jnp.asarray(x))
    ext = np.asarray(ext)  # (C, 8*(halo+8+halo), X)
    blk = halo + 8 + halo
    padded = np.pad(x, ((0, 0), (halo, halo), (0, 0)), mode="edge")
    for s in range(8):
        np.testing.assert_array_equal(ext[:, s * blk:(s + 1) * blk],
                                      padded[:, s * 8:s * 8 + blk])
