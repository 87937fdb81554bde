"""U-Net training: optax + BN-aware train state + the reference's data policy.

Rebuild of ``Segmentation/train.py:35-222``: random 256x256 crops from annotated
(image, label) frame pairs, max-normalization per crop, rotations in {0, 90, 180,
270} degrees, one-hot 2-channel targets (label 1 -> HC channel, label 2 -> SC
channel), crops with more than 30% boundary pixels rejected; Adam lr=1e-5, batch 32,
categorical cross-entropy. The train step is jitted with donated state; batches are
staged host-side by a numpy generator.

Run: ``python -m tissue_image_processing_tpu.models.train --data-path DIR``
with image_*.tif / labels_*.tif pairs (or .npy).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import pickle
from typing import Any, Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tissue_image_processing_tpu.models.unet import UNet

__all__ = ["TrainState", "create_train_state", "train_step", "crop_generator",
           "train_unet"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: UNet, input_shape, learning_rate: float = 1e-5,
                       seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng}, jnp.zeros((1,) + tuple(input_shape)),
                           train=False)
    tx = optax.adam(learning_rate)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.int32(0))
    return state, tx


def make_train_step(model: UNet, tx):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch_x, batch_y, rng):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch_x, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            eps = 1e-7
            ce = -jnp.sum(batch_y * jnp.log(out + eps), axis=-1)
            acc = jnp.mean((jnp.argmax(out, -1) == jnp.argmax(batch_y, -1)))
            return jnp.mean(ce), (mut["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), loss, acc

    return train_step


def crop_generator(images: Sequence[np.ndarray], labels: Sequence[np.ndarray],
                   batch_size: int = 32, crop: int = 256,
                   max_boundary_fraction: float = 0.3, seed: int = 0
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """The reference's crop/augment policy (``train.py:51-126``).

    ``images``: (C, Y, X) annotated frames; ``labels``: (Y, X) maps with
    0 = boundary, 1 = HC, 2 = SC (the reference reads channel 1 of its label tiffs).
    Yields (B, crop, crop, C) inputs (x-major like the predictor) and
    (B, crop, crop, 2) one-hot targets.
    """
    rng = np.random.default_rng(seed)
    while True:
        xs, ys = [], []
        while len(xs) < batch_size:
            i = rng.integers(0, len(images))
            img, lab = images[i], labels[i]
            _, Y, X = img.shape
            if Y <= crop or X <= crop:
                raise ValueError("frames must be larger than the crop size")
            r0 = rng.integers(1, Y - crop)
            c0 = rng.integers(1, X - crop)
            k = rng.integers(0, 4)
            sub = img[:, r0:r0 + crop, c0:c0 + crop].astype(np.float32)
            m = sub.max() or 1.0
            sub = sub / m
            sub_lab = lab[r0:r0 + crop, c0:c0 + crop]
            sub = np.rot90(sub, k, axes=(2, 1))
            sub_lab = np.rot90(sub_lab, k, axes=(1, 0))
            boundary_fraction = np.count_nonzero(sub_lab == 0) / sub_lab.size
            if boundary_fraction >= max_boundary_fraction:
                continue
            onehot = np.zeros((crop, crop, 2), np.float32)
            onehot[..., 0][sub_lab.T == 1] = 1
            onehot[..., 1][sub_lab.T == 2] = 1
            xs.append(np.transpose(sub))  # (crop, crop, C), x-major
            ys.append(onehot)
        yield np.stack(xs), np.stack(ys)


def train_unet(images, labels, epochs: int = 50, steps_per_epoch: int = 8,
               batch_size: int = 32, crop: int = 256, learning_rate: float = 1e-5,
               depth: int = 2, base_filters: int = 128, seed: int = 0,
               dtype=jnp.bfloat16):
    """Full training loop with the reference's recipe (``train.py:179-195``: the
    training net has 2 down blocks / 512 bottleneck). Returns (model, variables,
    history)."""
    model = UNet(depth=depth, base_filters=base_filters, dtype=dtype)
    state, tx = create_train_state(model, (crop, crop, images[0].shape[0]),
                                   learning_rate, seed)
    step_fn = make_train_step(model, tx)
    gen = crop_generator(images, labels, batch_size, crop, seed=seed)
    rng = jax.random.PRNGKey(seed + 1)
    history: Dict[str, List[float]] = {"loss": [], "accuracy": []}
    for epoch in range(epochs):
        losses, accs = [], []
        for _ in range(steps_per_epoch):
            bx, by = next(gen)
            rng, sub = jax.random.split(rng)
            state, loss, acc = step_fn(state, jnp.asarray(bx), jnp.asarray(by), sub)
            losses.append(float(loss))
            accs.append(float(acc))
        history["loss"].append(float(np.mean(losses)))
        history["accuracy"].append(float(np.mean(accs)))
        print(f"epoch {epoch + 1}/{epochs}: loss={history['loss'][-1]:.4f} "
              f"acc={history['accuracy'][-1]:.4f}", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables, history


def save_checkpoint(path: str, variables, history=None) -> None:
    """Orbax-style checkpointing of the trained variables (reference pickles its
    Keras history, ``train.py:196-201``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, variables))
    if history is not None:
        with open(str(path) + ".history.pkl", "wb") as f:
            pickle.dump(history, f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", dest="data_path", default="data")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps-per-epoch", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--out", default="outputs/unet_ckpt")
    args = p.parse_args(argv)
    import glob
    import os

    from tissue_image_processing_tpu.io.tiff import read_whole_image

    image_files = sorted(glob.glob(os.path.join(args.data_path, "image_*")))
    label_files = sorted(glob.glob(os.path.join(args.data_path, "labels_*")))
    images = [read_whole_image(f)[0] for f in image_files]
    labels = [read_whole_image(f)[0] for f in label_files]
    model, variables, history = train_unet(
        images, labels, epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        batch_size=args.batch_size)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_checkpoint(os.path.abspath(args.out), variables, history)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
