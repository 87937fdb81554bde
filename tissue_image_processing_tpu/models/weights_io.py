"""Keras h5 weight import for the shipped U-Net checkpoints.

The reference loads TF/Keras weights (``prediction_local.py:85-88``,
``UNET_WEIGHTS_PATH`` at ``gui.py:38``). To reuse those checkpoints, this module maps
a Keras ``model.save_weights`` h5 file onto the Flax UNet's params/batch_stats by
layer order: both frameworks create conv / batch-norm layers in the same sequence for
this architecture, and Keras conv kernels are already HWIO like Flax.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["load_keras_unet_weights", "keras_layer_arrays"]


def _layer_sort_key(name: str) -> Tuple[str, int]:
    m = re.match(r"^(.*?)(?:_(\d+))?$", name)
    base, idx = m.group(1), m.group(2)
    return base, int(idx) if idx else 0


def keras_layer_arrays(h5_path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read every layer's weight arrays from a Keras h5 checkpoint: layer name ->
    {short weight name ('kernel', 'bias', 'gamma', ...) -> array}."""
    import h5py

    out: Dict[str, Dict[str, np.ndarray]] = {}

    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if "layers" in root and "vars" in root:
            root = root["layers"]  # Keras 3 layout: layers/<name>/vars/<index>

        def collect(group, layer_name):
            arrays: Dict[str, np.ndarray] = {}
            ordered = []

            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    short = name.split("/")[-1].split(":")[0]
                    ordered.append((short, np.array(obj)))

            group.visititems(visit)
            if not ordered:
                return
            if all(s.isdigit() for s, _ in ordered):
                # Keras 3 stores anonymous vars/0..n in variable order
                vals = [a for _, a in sorted(ordered, key=lambda t: int(t[0]))]
                if layer_name.startswith("batch_normalization"):
                    names = ["gamma", "beta", "moving_mean", "moving_variance"]
                else:
                    names = ["kernel", "bias"]
                arrays = dict(zip(names, vals))
            else:
                arrays = dict(ordered)
            out[layer_name] = arrays

        for layer_name in root:
            collect(root[layer_name], layer_name)
    return out


def _flat_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def load_keras_unet_weights(variables, h5_path: str):
    """Map a Keras UNet h5 checkpoint onto Flax ``variables`` (params + batch_stats).

    Matching is positional: Keras ``conv2d*``/``conv2d_transpose*`` layers map onto
    Flax Conv/ConvTranspose modules in creation order, ``batch_normalization*`` onto
    BatchNorm modules in creation order.
    """
    layers = keras_layer_arrays(h5_path)

    conv_names = sorted(
        [n for n in layers if n.startswith("conv2d") and "transpose" not in n],
        key=_layer_sort_key)
    tconv_names = sorted([n for n in layers if n.startswith("conv2d_transpose")],
                         key=_layer_sort_key)
    bn_names = sorted([n for n in layers if n.startswith("batch_normalization")],
                      key=_layer_sort_key)

    params = jax_tree_to_mutable(variables["params"])
    stats = jax_tree_to_mutable(variables.get("batch_stats", {}))

    # creation order in UNet.__call__: DoubleConv_0..(2*depth) each holding
    # Conv_0/Conv_1 + BatchNorm_0/BatchNorm_1, ConvTranspose_0..depth-1 interleaved
    # on the way up, and the top-level 1x1 Conv_0 head last — the same order Keras
    # numbers conv2d*/batch_normalization* in the reference builder.
    n_dc = len([k for k in params if k.startswith("DoubleConv_")])
    depth = (n_dc - 1) // 2
    conv_paths = [(f"DoubleConv_{i}", f"Conv_{j}")
                  for i in range(n_dc) for j in (0, 1)] + [("Conv_0",)]
    bn_param_paths = [(f"DoubleConv_{i}", f"BatchNorm_{j}")
                      for i in range(n_dc) for j in (0, 1)]
    bn_stat_paths = bn_param_paths
    tconv_paths = [(f"ConvTranspose_{i}",) for i in range(depth)]

    if len(conv_names) != len(conv_paths) or len(bn_names) != len(bn_param_paths) \
            or len(tconv_names) != len(tconv_paths):
        raise ValueError(
            f"layer count mismatch: keras convs={len(conv_names)} flax={len(conv_paths)}, "
            f"bns={len(bn_names)}/{len(bn_param_paths)}, "
            f"tconvs={len(tconv_names)}/{len(tconv_paths)}")

    for name, path in zip(conv_names, conv_paths):
        _assign(params, path, {"kernel": layers[name]["kernel"],
                               "bias": layers[name]["bias"]})
    for name, path in zip(tconv_names, tconv_paths):
        # Keras ConvTranspose kernels are (h, w, out, in) in gradient-of-conv
        # convention; Flax uses true transposed convolution -> transpose the channel
        # axes AND flip spatially
        k = layers[name]["kernel"][::-1, ::-1]
        _assign(params, path, {"kernel": np.transpose(k, (0, 1, 3, 2)),
                               "bias": layers[name]["bias"]})
    for name, ppath, spath in zip(bn_names, bn_param_paths, bn_stat_paths):
        arr = layers[name]
        _assign(params, ppath, {"scale": arr["gamma"], "bias": arr["beta"]})
        _assign(stats, spath, {"mean": arr["moving_mean"],
                               "var": arr["moving_variance"]})

    return {"params": params, "batch_stats": stats}


def jax_tree_to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: jax_tree_to_mutable(v) for k, v in tree.items()}
    return tree


def _assign(tree, path, values: Dict[str, np.ndarray]):
    node = tree
    for k in path:
        node = node[k]
    import jax.numpy as jnp

    for k, v in values.items():
        if k not in node:
            raise KeyError(f"{k} not in flax module {path}")
        expected = node[k].shape
        if tuple(v.shape) != tuple(expected):
            raise ValueError(f"shape mismatch at {path}/{k}: keras {v.shape} vs "
                             f"flax {expected}")
        node[k] = jnp.asarray(v, dtype=node[k].dtype)
