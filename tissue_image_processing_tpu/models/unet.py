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

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet", "build_unet", "fold_batchnorm"]


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_f32_accum(x, k, strides, padding, dn):
    """conv_general_dilated with f32 accumulation (preferred_element_type)
    and a grad that works on bf16 operands: jax 0.9's builtin conv grad feeds
    the f32 cotangent back into a conv against the bf16 kernel and raises a
    dtype mismatch. Forward is the identical primitive; backward casts the
    cotangent to the operand dtype and uses the plain conv's vjp (standard
    mixed-precision training)."""
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def _conv_f32_accum_fwd(x, k, strides, padding, dn):
    return _conv_f32_accum(x, k, strides, padding, dn), (x, k)


def _conv_f32_accum_bwd(strides, padding, dn, res, g):
    x, k = res
    _, vjp = jax.vjp(lambda x_, k_: jax.lax.conv_general_dilated(
        x_, k_, strides, padding, dimension_numbers=dn), x, k)
    return vjp(g.astype(x.dtype))


_conv_f32_accum.defvjp(_conv_f32_accum_fwd, _conv_f32_accum_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_transpose_f32_accum(x, k, strides, padding, dn):
    """Transposed-conv twin of :func:`_conv_f32_accum`."""
    return jax.lax.conv_transpose(
        x, k, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def _conv_transpose_f32_accum_fwd(x, k, strides, padding, dn):
    return _conv_transpose_f32_accum(x, k, strides, padding, dn), (x, k)


def _conv_transpose_f32_accum_bwd(strides, padding, dn, res, g):
    x, k = res
    _, vjp = jax.vjp(lambda x_, k_: jax.lax.conv_transpose(
        x_, k_, strides, padding, dimension_numbers=dn), x, k)
    return vjp(g.astype(x.dtype))


_conv_transpose_f32_accum.defvjp(_conv_transpose_f32_accum_fwd,
                                 _conv_transpose_f32_accum_bwd)


def _auto_row_split(B: int, H: int) -> int:
    """Row-split factor for the space-to-batch conv path.

    XLA's conv tilings on v5e reach ~190 TF/s once the batch dimension is
    >= 8 but only ~60-120 TF/s below it (probe_unet_batch.py / probe_s2b.py:
    a 1024^2 256->128 conv runs 9.94 ms at B=1 vs 3.29 ms as B=8 x 128 rows).
    The split pays a full-tensor halo-build copy (~2-4 ms at 1024^2), so it is
    only profitable where the tiling gain is largest — the full-resolution
    convs (1024 rows at B=1: 9.9 -> 7.3 ms measured for 256->128ch). Returns
    the smallest S with B*S >= 8, S | H and H/S >= 128 rows per slice, else 1."""
    if B >= 8:
        return 1
    for S in range(-(-8 // B), H // 128 + 1):
        if H % S == 0 and H // S >= 128:
            return S
    return 1


class _FusedConv(nn.Module):
    """nn.Conv-compatible conv (same param names/shapes/init) that feeds the
    MXU in ``dtype`` but accumulates in float32 (``preferred_element_type``).

    Measured on v5e at 1024^2 x 128ch: nn.Conv(dtype=bf16) emits a bf16-output
    conv that runs at 54 TF/s, while the same conv with an f32 accumulate +
    fused epilogue cast runs at 76-95 TF/s — the f32 accumulator output lets
    XLA pick a better conv tiling. The epilogue (bias, relu, BN affine) stays
    in f32 and the caller casts back to ``dtype`` once per block.

    ``row_split=S > 1`` evaluates the SAME 3x3 conv space-to-batch: the rows
    are cut into S slices with 1-row halos from the neighboring slices (zeros
    at the outer edges, so the result is exactly the SAME-padded conv), and
    the conv runs on the (B*S, H/S + 2, W, C) stack — small batches then hit
    the fast >=8-batch conv tilings (see _auto_row_split)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()
    padding: Any = "SAME"
    row_split: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        S = self.row_split
        if (S > 1 and self.kernel_size == (3, 3) and self.padding == "SAME"
                and x.shape[1] % S == 0):
            B, H, W, C = x.shape
            h = H // S
            xs = x.reshape(B, S, h, W, C)
            zero = jnp.zeros((B, 1, 1, W, C), x.dtype)
            above = jnp.concatenate([zero, xs[:, :-1, -1:]], axis=1)
            below = jnp.concatenate([xs[:, 1:, :1], zero], axis=1)
            xh = jnp.concatenate([above, xs, below], axis=2)
            y = _conv_f32_accum(
                xh.reshape(B * S, h + 2, W, C).astype(self.dtype),
                kernel.astype(self.dtype), (1, 1), ((0, 0), (1, 1)),
                ("NHWC", "HWIO", "NHWC"))
            return y.reshape(B, H, W, self.features) + bias
        pad = (self.padding if isinstance(self.padding, str)
               else tuple(tuple(p) for p in self.padding))
        y = _conv_f32_accum(x.astype(self.dtype), kernel.astype(self.dtype),
                            (1, 1), pad, ("NHWC", "HWIO", "NHWC"))
        return y + bias


class _FusedConvTranspose(nn.Module):
    """nn.ConvTranspose-compatible stride-2 transposed conv with f32 accum
    (see _FusedConv); kernel layout (kh, kw, in, out) like flax."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        y = _conv_transpose_f32_accum(
            x.astype(self.dtype), kernel.astype(self.dtype), (2, 2), "SAME",
            ("NHWC", "HWIO", "NHWC"))
        return (y + bias).astype(self.dtype)


class DoubleConv(nn.Module):
    """Conv3x3 -> ReLU -> BatchNorm, twice (Keras order: activation before BN,
    reference ``prediction_local.py:31-38``). ``norm="none"`` drops the BN
    (ablation / perf experiments only — not the reference architecture);
    ``norm="shift"`` replaces it with a per-channel bias — the inference form
    produced by :func:`fold_batchnorm` (BN scale folded into the conv).

    The conv accumulates in f32 and the relu/BN epilogue stays f32 (fused by
    XLA into the conv); activations re-enter ``dtype`` at the next conv."""

    filters: int
    dtype: Any = jnp.float32
    norm: str = "bn"
    row_split: int = 1  # -1 = auto (per call shape), 1 = off, S > 1 = fixed

    @nn.compact
    def __call__(self, x, train: bool = False):
        S = self.row_split
        if S == -1:
            S = _auto_row_split(x.shape[0], x.shape[1])
        for i in range(2):
            x = _FusedConv(self.filters, (3, 3), dtype=self.dtype,
                           kernel_init=nn.initializers.he_normal(),
                           row_split=S,
                           name=f"Conv_{i}")(x)
            x = nn.relu(x)
            if self.norm == "bn":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=jnp.float32,
                                 name=f"BatchNorm_{i}")(x)
            elif self.norm == "shift":
                x = x + self.param(f"Shift_{i}", nn.initializers.zeros_init(),
                                   (self.filters,), jnp.float32)
        return x.astype(self.dtype)


class UNet(nn.Module):
    """U-Net with ``depth`` down blocks starting at ``base_filters``.

    ``norm`` / ``up_kind`` are perf-ablation knobs; the defaults reproduce the
    reference architecture exactly (``prediction_local.py:31-72``).
    up_kind: "convt" (Keras Conv2DTranspose k3 s2) | "subpixel" (equivalent
    channel-packed conv + depth-to-space, see _subpixel_up) | "resize_conv"
    (nearest 2x resize + 3x3 conv — NOT weight-compatible, ablation only).
    row_split: space-to-batch factor for the 3x3 convs (1 = off — the
    measured default: the halo-build copies cost more than the conv-tiling
    gain in-net, 42.0 -> 46.7 ms/frame at B=1 1024^2 even when restricted to
    the full-res convs; -1 auto / S fixed remain as ablation knobs, exact to
    the unsplit path; see _FusedConv and _auto_row_split).
    """

    depth: int = 3
    base_filters: int = 128
    num_classes: int = 2
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32
    norm: str = "bn"
    up_kind: str = "convt"
    row_split: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        filters = [self.base_filters * (2 ** i) for i in range(self.depth)]
        for f in filters:
            skip = DoubleConv(f, dtype=self.dtype, norm=self.norm,
                              row_split=self.row_split)(x, train)
            skips.append(skip)
            x = nn.max_pool(skip, (2, 2), strides=(2, 2))
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = DoubleConv(filters[-1] * 2, dtype=self.dtype, norm=self.norm,
                       row_split=self.row_split)(x, train)
        for j, (f, skip) in enumerate(zip(reversed(filters), reversed(skips))):
            if self.up_kind == "convt":
                x = _FusedConvTranspose(f, (3, 3), dtype=self.dtype,
                                        name=f"ConvTranspose_{j}")(x)
            elif self.up_kind == "resize_conv":
                h, w = x.shape[1] * 2, x.shape[2] * 2
                x = jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                                     method="nearest")
                x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            else:
                x = _SubpixelUp(f, dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = DoubleConv(f, dtype=self.dtype, norm=self.norm,
                           row_split=self.row_split)(x, train)
        x = _FusedConv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="Conv_0")(x)
        return nn.softmax(x.astype(jnp.float32), axis=-1)


class _SubpixelUp(nn.Module):
    """ConvTranspose(k=3, s=2, SAME) re-expressed as one stride-1 conv that
    emits the 4 output phases as channel groups + a depth-to-space interleave.

    For stride 2, output pixel (2i+di, 2j+dj) receives input taps whose
    transposed-kernel rows/cols have parity (di, dj) — a 2x2 sub-kernel of the
    3x3 — so the whole op is Conv(4f, (2,2)) on the half-res input followed by
    a reshape interleave. Identical arithmetic, but a dense stride-1 conv maps
    onto the MXU without the input-dilation lowering XLA uses for
    ConvTranspose. Weights are NOT initialized Keras-compatible here; use
    fold_convtranspose_weights to convert imported reference weights.
    """

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        f = self.filters
        y = _FusedConv(4 * f, (2, 2), padding=((1, 0), (1, 0)),
                       dtype=self.dtype, name="packed")(x)
        y = y.astype(self.dtype).reshape(B, H, W, 2, 2, f)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, f)
        return y


def build_unet(input_shape: Tuple[int, int, int], depth: int = 3,
               base_filters: int = 128, dtype=jnp.float32, seed: int = 0,
               **kwargs):
    """Initialize a U-Net; returns (module, variables) like the reference's
    ``build_unet_model`` (``prediction_local.py:60-72``)."""
    model = UNet(depth=depth, base_filters=base_filters, dtype=dtype, **kwargs)
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng}, jnp.zeros((1,) + tuple(input_shape)),
                           train=False)
    return model, variables


def _bn_affine(bn_params: dict, bn_stats: dict, eps: float = 1e-3):
    """Running-stats BatchNorm as y -> a*y + b."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return a, bn_params["bias"] - bn_stats["mean"] * a


def fold_batchnorm(variables: dict, depth: int = 3) -> dict | None:
    """Inference-only transform: fold each post-ReLU BatchNorm's scale into
    its own conv, returning variables for ``UNet(norm="shift")``.

    The reference net (prediction_local.py:31-38) orders Conv -> ReLU -> BN.
    Pushing the full affine FORWARD through the next zero-SAME-padded conv is
    inexact at borders (padded taps read 0, not the shift), so instead: with
    per-channel a > 0, BN(relu(y)) = a*relu(y) + b = relu(a*y) + b — the
    scale commutes back through the ReLU into the conv's OUTPUT channels
    (padding-immune), leaving only a per-channel "+b" at the BN site, which
    XLA fuses into the conv epilogue. Returns None if any a <= 0 (never for
    real trained gammas) so callers keep the BN model. Mathematically
    identical output; removes the mean/var/scale traffic of 14 full-frame
    BatchNorms per forward.
    """
    if "batch_stats" not in variables:
        return None
    # stay on device: a device_get/deepcopy here would hand jit host numpy
    # params, re-transferred on every call (~2 s/call via the dev tunnel)
    params = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in variables["params"].items()}
    stats = variables["batch_stats"]
    n_dc = 2 * depth + 1
    import numpy as _np
    scale_mins = []  # one host read for all BNs (each read syncs the tunnel)
    for k in range(n_dc):
        dc = params[f"DoubleConv_{k}"]
        for i in range(2):
            a, b = _bn_affine(dc[f"BatchNorm_{i}"],
                              stats[f"DoubleConv_{k}"][f"BatchNorm_{i}"])
            scale_mins.append(jnp.min(a))
            conv = dc[f"Conv_{i}"]
            dc[f"Conv_{i}"] = {"kernel": conv["kernel"] * a[None, None, None, :],
                               "bias": conv["bias"] * a}
            del dc[f"BatchNorm_{i}"]
            dc[f"Shift_{i}"] = b
    if _np.asarray(jnp.min(jnp.stack(scale_mins))) <= 0:
        return None
    return {"params": params}


def fold_convtranspose_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) ConvTranspose kernel -> the (2, 2, C, 4F) packed kernel of
    :class:`_SubpixelUp` computing the identical map.

    flax's SAME stride-2 transpose places tap k of the 3-kernel at output
    o = 2i + 2 - k (impulse-verified), so even outputs read
    w[2] x[m] + w[0] x[m-1] and odd outputs read w[1] x[m]: phase (di, dj) of
    pixel (2m+di, 2n+dj) is a 2x2 conv over the FRONT-padded window
    x[m-1..m, n-1..n] through the parity-(di, dj) sub-kernel.
    """
    C, F = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, C, 4 * F), w.dtype)
    rowsel = {0: [(0, 0), (1, 2)], 1: [(1, 1)]}  # (K2 tap, w tap) per parity
    for di in (0, 1):
        for dj in (0, 1):
            g = di * 2 + dj
            for (a, kr) in rowsel[di]:
                for (b, kc) in rowsel[dj]:
                    out = out.at[a, b, :, g * F:(g + 1) * F].set(w[kr, kc])
    return out


def convtranspose_to_subpixel_params(ct_params: dict) -> dict:
    """{'kernel','bias'} of a ConvTranspose -> params for _SubpixelUp.packed."""
    folded = {"kernel": fold_convtranspose_kernel(ct_params["kernel"])}
    if "bias" in ct_params:
        folded["bias"] = jnp.tile(ct_params["bias"], 4)
    return {"packed": folded}


def variables_to_subpixel(variables: dict) -> dict:
    """Convert a UNet(up_kind="convt") variable tree (including imported Keras
    reference weights, weights_io.py) to the UNet(up_kind="subpixel") layout —
    identical outputs, MXU-friendlier upsampling."""
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    params = dict(out["params"])
    for name in list(params):
        if name.startswith("ConvTranspose_"):
            idx = name.split("_")[1]
            params[f"_SubpixelUp_{idx}"] = convtranspose_to_subpixel_params(
                params.pop(name))
    out["params"] = params
    return out
