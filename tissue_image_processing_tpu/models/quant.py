"""Optional int8 inference path for the U-Net.

The v5e MXU runs int8 at ~2x its bf16 rate (measured 335 vs 191 T/s on the
batched 3x3 256->128 conv, probe_int8_b8.py), so the 3x3 convs — ~93% of the
forward's 4.94 TFLOP (reference architecture, ``prediction_local.py:60-72``)
— run quantized while the transposed convs and 1x1 head stay bf16.

Scheme (standard post-training quantization):
- weights: symmetric per-OUTPUT-channel int8, scale s_w[o] = max|w[..., o]|/127;
- activations: symmetric per-tensor int8 with STATIC scales calibrated on a
  representative batch (one f32 forward records per-tensor absmaxes) — a
  dynamic scale would cost an extra full-tensor reduction pass per conv;
- the i32 accumulator dequantizes in the conv epilogue
  (y * s_x * s_w + bias -> relu -> +shift -> requantize for the next conv),
  which XLA fuses into one pass.

Activations stay int8 ACROSS block boundaries, not just between the two convs
of a DoubleConv: each block emits its output already requantized (fused into
the second conv's epilogue), the down-path max-pool runs on int8 (max pooling
commutes with the monotone quantization map), and the skip concatenation is
re-expressed as a SPLIT CONV — conv(concat([up, skip]), W) =
conv(up, W[:, :, :Cup]) + conv(skip, W[:, :, Cup:]) with each half dequantized
by its own calibrated scale in a shared epilogue. The skip tensor is therefore
quantized exactly once (at the down block that produced it) and the large
level-0 bf16 tensors of the naive scheme — the skip itself, the pool
input/output and the 2x-channel concat — are never materialized, quartering
the HBM traffic at the resolutions where the forward is bandwidth-bound.

The topology walker `_forward` reimplements UNet(norm="shift",
up_kind="convt") inference wiring explicitly over the folded-BN params
(models/unet.py:fold_batchnorm) so the calibration pass, the parity test and
the int8 pass share one wiring; `tests/test_unet.py` pins it against
``model.apply`` exactly.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["quantize_unet", "unet_int8_apply"]


def _pool2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


def _conv_f32(x, kernel, bias, shift, record, name):
    if record is not None:
        record[name] = jnp.max(jnp.abs(x))
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bias
    return jnp.maximum(y, 0.0) + shift


def _quant(x, a):
    return jnp.round(jnp.clip(x * (127.0 / a), -127.0, 127.0)).astype(jnp.int8)


def _conv_s8(xq, wq):
    return jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _epilogue(acc_f32, q, in_scale):
    """Dequantize + bias + relu + shift (one fused pass in XLA)."""
    y = acc_f32 * (q["wscale"] * (in_scale / 127.0)) + q["bias"]
    return jnp.maximum(y, 0.0) + q["shift"]


def _dc_int8(xq, xs, d):
    """Int8 DoubleConv over an int8 input (scale ``xs``): both requantizes
    fuse into the producing convs' epilogues, so every activation the block
    materializes is int8. Returns (int8 output, its scale)."""
    q0, q1 = d["Conv_0"], d["Conv_1"]
    y0 = _epilogue(_conv_s8(xq, q0["wq"]).astype(jnp.float32), q0, xs)
    a1 = q1["in_scale"]
    y1 = _epilogue(_conv_s8(_quant(y0, a1), q1["wq"]).astype(jnp.float32),
                   q1, a1)
    return _quant(y1, d["out_scale"]), d["out_scale"]


def _dc_int8_split(upq, ups, skq, sks, d):
    """Int8 DoubleConv whose first conv consumes the (up, skip) concat as a
    split conv — each int8 half dequantized by its own scale in the shared
    epilogue — so the concat tensor never exists."""
    q0, q1 = d["Conv_0"], d["Conv_1"]
    nu = upq.shape[-1]
    acc = (_conv_s8(upq, q0["wq"][:, :, :nu]).astype(jnp.float32) * (ups / 127.0)
           + _conv_s8(skq, q0["wq"][:, :, nu:]).astype(jnp.float32) * (sks / 127.0))
    y0 = jnp.maximum(acc * q0["wscale"] + q0["bias"], 0.0) + q0["shift"]
    a1 = q1["in_scale"]
    y1 = _epilogue(_conv_s8(_quant(y0, a1), q1["wq"]).astype(jnp.float32),
                   q1, a1)
    return _quant(y1, d["out_scale"]), d["out_scale"]


def _forward_int8(params, x, depth, ct_dtype=jnp.bfloat16):
    a_in = params["in_scale"]
    xq, xs = _quant(x.astype(jnp.float32), a_in), a_in
    skips = []
    for k in range(depth):
        sq, ss = _dc_int8(xq, xs, params[f"DoubleConv_{k}"])
        skips.append((sq, ss))
        # max pooling commutes with the (monotone) quantization map, so the
        # pooled tensor keeps the producing block's scale.
        xq, xs = _pool2(sq), ss
    xq, xs = _dc_int8(xq, xs, params[f"DoubleConv_{depth}"])
    for j in range(depth):
        ct = params[f"ConvTranspose_{j}"]
        up_in = xq.astype(ct_dtype) * (xs / 127.0).astype(ct_dtype)
        up = jax.lax.conv_transpose(
            up_in, ct["kernel"].astype(ct_dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + ct["bias"]
        upq = _quant(up, ct["out_scale"])
        skq, sks = skips[depth - 1 - j]
        xq, xs = _dc_int8_split(upq, ct["out_scale"], skq, sks,
                                params[f"DoubleConv_{depth + 1 + j}"])
    head = params["Conv_0"]
    xh = xq.astype(ct_dtype) * (xs / 127.0).astype(ct_dtype)
    y = jax.lax.conv_general_dilated(
        xh, head["kernel"].astype(ct_dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + head["bias"]
    return jax.nn.softmax(y, axis=-1)


def _forward(params, x, depth, ct_dtype=jnp.float32, record=None):
    """UNet(norm="shift", up_kind="convt") f32 inference wiring over folded
    params — the calibration / parity twin (pinned vs ``model.apply`` by
    tests/test_unet.py). ``record`` collects the per-tensor absmaxes the
    quantizer needs: each conv's input, each DoubleConv's output and each
    ConvTranspose's output."""

    def dc(x, k):
        d = params[f"DoubleConv_{k}"]
        for i in range(2):
            name = f"DoubleConv_{k}/Conv_{i}"
            x = _conv_f32(x, d[f"Conv_{i}"]["kernel"], d[f"Conv_{i}"]["bias"],
                          d[f"Shift_{i}"], record, name)
        if record is not None:
            record[f"DoubleConv_{k}/out"] = jnp.max(jnp.abs(x))
        return x

    x = x.astype(jnp.float32)
    if record is not None:
        record["in"] = jnp.max(jnp.abs(x))
    skips = []
    for k in range(depth):
        skip = dc(x, k)
        skips.append(skip)
        x = _pool2(skip)
    x = dc(x, depth)
    for j in range(depth):
        ct = params[f"ConvTranspose_{j}"]
        up = jax.lax.conv_transpose(
            x.astype(ct_dtype), ct["kernel"].astype(ct_dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + ct["bias"]
        if record is not None:
            record[f"ConvTranspose_{j}/out"] = jnp.max(jnp.abs(up))
        x = jnp.concatenate([up, skips[depth - 1 - j]], axis=-1)
        x = dc(x, depth + 1 + j)
    head = params["Conv_0"]
    y = jax.lax.conv_general_dilated(
        x.astype(ct_dtype), head["kernel"].astype(ct_dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + head["bias"]
    return jax.nn.softmax(y, axis=-1)


def unet_f32_apply(variables: Dict, x: jnp.ndarray, depth: int = 3,
                   record: Optional[dict] = None) -> jnp.ndarray:
    """Float forward over folded-BN params — the calibration / parity-test
    twin of :func:`unet_int8_apply` (same wiring as UNet.apply, pinned by
    tests/test_unet.py)."""
    return _forward(variables["params"], x, depth,
                    ct_dtype=jnp.float32, record=record)


def quantize_unet(variables: Dict, sample: jnp.ndarray, depth: int = 3,
                  headroom: float = 1.02) -> Dict:
    """Post-training quantization of folded-BN U-Net variables.

    ``sample``: representative (B, H, W, 2) input batch for activation
    calibration (per-tensor absmaxes; ``headroom`` scales the recorded
    maxes — the 2% default absorbs the int8 path's extra quantization noise
    on tensors whose absmax was calibrated on the f32 twin, e.g. the
    ConvTranspose outputs, which would otherwise clip at exactly +-127).
    Returns a qparams tree for :func:`unet_int8_apply`.

    Which scales the int8 path actually consumes: each DoubleConv stores
    ``in_scale`` only for Conv_1 (the inter-conv requantize) — Conv_0's input
    arrives already int8 with the PRODUCER's scale (the previous block's
    ``out_scale``, or the two split-conv halves' scales in the up path), so a
    Conv_0 input scale of its own would be redundant.
    """
    record: dict = {}
    _forward(variables["params"], sample, depth,
             ct_dtype=jnp.float32, record=record)
    record = {k: jnp.maximum(v * headroom, 1e-8) for k, v in record.items()}

    out = {"in_scale": record["in"]}
    for name, sub in variables["params"].items():
        if name.startswith("DoubleConv_"):
            q = {"out_scale": record[f"{name}/out"]}
            for i in range(2):
                conv = sub[f"Conv_{i}"]
                w = conv["kernel"]
                s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                                  1e-12) / 127.0
                wq = jnp.round(w / s_w).astype(jnp.int8)
                q[f"Conv_{i}"] = {
                    "wq": wq,
                    "wscale": s_w,
                    "bias": conv["bias"],
                    "shift": sub[f"Shift_{i}"],
                }
                if i == 1:  # the only input scale the int8 path consumes
                    q[f"Conv_{i}"]["in_scale"] = record[f"{name}/Conv_{i}"]
            out[name] = q
        elif name.startswith("ConvTranspose_"):
            j = name.split("_")[1]
            out[name] = dict(sub, out_scale=record[f"ConvTranspose_{j}/out"])
        else:
            out[name] = sub
    return {"params": out}


@functools.partial(jax.jit, static_argnames=("depth",))
def unet_int8_apply(qparams: Dict, x: jnp.ndarray, depth: int = 3) -> jnp.ndarray:
    """int8 inference forward; output matches UNet.apply within quantization
    noise (mean |dP| ~1e-3 on calibrated data, tests/test_unet.py)."""
    return _forward_int8(qparams["params"], x, depth,
                         ct_dtype=jnp.bfloat16)
