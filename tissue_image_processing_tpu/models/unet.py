"""Flax U-Net matching the reference's Keras architecture.

Reference ``Segmentation/prediction_local.py:31-72`` (inference net: 3 down blocks of
128/256/512 filters, 1024 bottleneck) and ``Segmentation/train.py:139-177`` (training
variant: 2 down blocks 128/256, 512 bottleneck). Blocks are Conv3x3(+ReLU) -> BN,
twice; downsampling is 2x2 max-pool + dropout(0.3); upsampling is stride-2 transposed
conv + skip concat + dropout + double conv; head is 1x1 conv softmax over 2 classes
(HC probability, SC probability).

TPU-first details: NHWC layout, bfloat16 compute with float32 params/statistics, and
channel counts that are multiples of 128 so every conv lands on full MXU tiles.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet", "build_unet"]


class DoubleConv(nn.Module):
    """Conv3x3 -> ReLU -> BatchNorm, twice (Keras order: activation before BN,
    reference ``prediction_local.py:31-38``)."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal())(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype)(x)
        return x


class UNet(nn.Module):
    """U-Net with ``depth`` down blocks starting at ``base_filters``."""

    depth: int = 3
    base_filters: int = 128
    num_classes: int = 2
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        filters = [self.base_filters * (2 ** i) for i in range(self.depth)]
        for f in filters:
            skip = DoubleConv(f, dtype=self.dtype)(x, train)
            skips.append(skip)
            x = nn.max_pool(skip, (2, 2), strides=(2, 2))
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = DoubleConv(filters[-1] * 2, dtype=self.dtype)(x, train)
        for f, skip in zip(reversed(filters), reversed(skips)):
            x = nn.ConvTranspose(f, (3, 3), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = DoubleConv(f, dtype=self.dtype)(x, train)
        x = nn.Conv(self.num_classes, (1, 1), padding="SAME", dtype=self.dtype)(x)
        return nn.softmax(x.astype(jnp.float32), axis=-1)


def build_unet(input_shape: Tuple[int, int, int], depth: int = 3,
               base_filters: int = 128, dtype=jnp.float32, seed: int = 0):
    """Initialize a U-Net; returns (module, variables) like the reference's
    ``build_unet_model`` (``prediction_local.py:60-72``)."""
    model = UNet(depth=depth, base_filters=base_filters, dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng}, jnp.zeros((1,) + tuple(input_shape)),
                           train=False)
    return model, variables
