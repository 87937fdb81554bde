"""Optional int8 inference path for the U-Net.

The v5e MXU runs int8 at ~2x its bf16 rate (measured 335 vs 191 T/s on the
batched 3x3 256->128 conv, probe_int8_b8.py), so the 3x3 convs — ~93% of the
forward's 4.94 TFLOP (reference architecture, ``prediction_local.py:60-72``)
— run quantized while the transposed convs and 1x1 head stay bf16.

Scheme (standard post-training quantization):
- weights: symmetric per-OUTPUT-channel int8, scale s_w[o] = max|w[..., o]|/127;
- activations: symmetric per-tensor int8 with STATIC scales calibrated on a
  representative batch (one f32 forward records per-conv input absmax) — a
  dynamic scale would cost an extra full-tensor reduction pass per conv;
- the i32 accumulator dequantizes in the conv epilogue
  (y * s_x * s_w + bias -> relu -> +shift -> requantize for the next conv),
  which XLA fuses into one pass; int8 activations also halve HBM traffic.

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


def _dc_int8(x, d):
    """Int8 DoubleConv: the requantize for the second conv fuses into the
    first conv's epilogue, so the inter-conv activation travels as int8
    (quarter the f32 HBM traffic); the block output returns bf16 for the
    pool/concat/transpose stages."""
    q0, q1 = d["Conv_0"], d["Conv_1"]
    a0, a1 = q0["in_scale"], q1["in_scale"]
    acc0 = _conv_s8(_quant(x.astype(jnp.float32), a0), q0["wq"])
    y0 = (jnp.maximum(acc0.astype(jnp.float32) * (q0["wscale"] * (a0 / 127.0))
                      + q0["bias"], 0.0) + q0["shift"])
    acc1 = _conv_s8(_quant(y0, a1), q1["wq"])
    y1 = (jnp.maximum(acc1.astype(jnp.float32) * (q1["wscale"] * (a1 / 127.0))
                      + q1["bias"], 0.0) + q1["shift"])
    return y1.astype(jnp.bfloat16)


def _forward(params, x, depth, dc_kind, ct_dtype=jnp.bfloat16, record=None):
    """UNet(norm="shift", up_kind="convt") inference forward over folded
    params; dc_kind: "f32" (calibration/parity twin) or "int8"."""

    def dc(x, k):
        d = params[f"DoubleConv_{k}"]
        if dc_kind == "int8":
            return _dc_int8(x, d)
        for i in range(2):
            name = f"DoubleConv_{k}/Conv_{i}"
            x = _conv_f32(x, d[f"Conv_{i}"]["kernel"], d[f"Conv_{i}"]["bias"],
                          d[f"Shift_{i}"], record, name)
        return x

    x = x.astype(jnp.float32)
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
    return _forward(variables["params"], x, depth, "f32",
                    ct_dtype=jnp.float32, record=record)


def quantize_unet(variables: Dict, sample: jnp.ndarray, depth: int = 3,
                  headroom: float = 1.0) -> Dict:
    """Post-training quantization of folded-BN U-Net variables.

    ``sample``: representative (B, H, W, 2) input batch for activation
    calibration (per-conv input absmax; ``headroom`` scales the recorded
    maxes). Returns a qparams tree for :func:`unet_int8_apply`.
    """
    record: dict = {}
    _forward(variables["params"], sample, depth, "f32",
             ct_dtype=jnp.float32, record=record)
    record = {k: jnp.maximum(v * headroom, 1e-8) for k, v in record.items()}

    out = {}
    for name, sub in variables["params"].items():
        if name.startswith("DoubleConv_"):
            q = {}
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
                    "in_scale": record[f"{name}/Conv_{i}"],
                }
            out[name] = q
        else:
            out[name] = sub
    return {"params": out}


@functools.partial(jax.jit, static_argnames=("depth",))
def unet_int8_apply(qparams: Dict, x: jnp.ndarray, depth: int = 3) -> jnp.ndarray:
    """int8 inference forward; output matches UNet.apply within quantization
    noise (mean |dP| ~1e-3 on calibrated data, tests/test_unet.py)."""
    return _forward(qparams["params"], x, depth, "int8",
                    ct_dtype=jnp.bfloat16)
