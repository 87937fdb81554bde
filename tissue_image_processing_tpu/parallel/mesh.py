"""Device mesh + sharding for multi-chip scale-out.

The reference is single-process/single-device (SURVEY.md §2.9); this module supplies
the scale-out the reference never had, the TPU way: a ``jax.sharding.Mesh`` with axes

- ``data``  — frames / batch (pure data parallelism; gradient psum rides ICI),
- ``model`` — channel/tensor parallelism for the U-Net (conv output channels and the
  matching activations are sharded; XLA GSPMD inserts the all-gathers/reduce-scatters),

and helpers to place movie batches and parameters. The ``data`` axis can span hosts
over DCN later without API changes; image ops (watershed, projection) scale by
sharding the frame axis, which needs no collectives at all.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_params", "unet_train_step_sharded"]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """Build a (data x model) mesh over the available devices.

    The model axis gets the largest power-of-two factor up to 4; the rest is data.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} device(s) are "
            f"visible on the '{jax.default_backend()}' backend; for a virtual "
            f"CPU mesh set XLA_FLAGS=--xla_force_host_platform_device_count={n} "
            f"and JAX_PLATFORMS=cpu before importing jax")
    devices = devices[:n]
    model = 1
    for cand in (4, 2):
        if n % cand == 0:
            model = cand
            break
    data = n // model
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, batch: jnp.ndarray) -> jnp.ndarray:
    """Place a (B, ...) array with the batch axis split over the data axis."""
    spec = P("data", *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def _param_spec(path_leaf_shape) -> P:
    """Conv kernels: shard output channels (last axis) over 'model'; biases/BN over
    'model' too (they are per-output-channel); everything else replicated."""
    shape = path_leaf_shape
    if len(shape) == 4:          # conv kernels HWIO
        return P(None, None, None, "model")
    if len(shape) == 1:          # bias / scale / BN stats
        return P("model")
    return P()


def shard_params(mesh: Mesh, variables, min_shard: int = 1):
    """Apply tensor-parallel NamedShardings to a U-Net variable tree. Axes whose size
    does not divide the model axis stay replicated."""
    model_size = mesh.shape["model"]

    def place(x):
        x = jnp.asarray(x)
        spec = _param_spec(x.shape)
        # drop sharding on axes not divisible by the mesh axis
        sizes = dict(zip(spec, x.shape)) if spec else {}
        ok = all((s is None) or (dim % model_size == 0)
                 for s, dim in zip(spec, x.shape))
        if not ok:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, variables)


def unet_train_step_sharded(mesh: Mesh, model, tx):
    """A pjit'ed U-Net training step over the mesh: dp over batch, tp over conv
    channels (sharding-constrained activations let GSPMD pick the collectives)."""
    from tissue_image_processing_tpu.models.train import TrainState

    batch_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch_x, batch_y, rng):
        batch_x = jax.lax.with_sharding_constraint(batch_x, batch_sharding)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch_x, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            ce = -jnp.sum(batch_y * jnp.log(out + 1e-7), axis=-1)
            return jnp.mean(ce), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        import optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

    return step
