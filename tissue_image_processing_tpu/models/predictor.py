"""U-Net segmentation predictor with watershed post-processing.

Rebuild of the reference ``SegmentationPredictor``
(``Segmentation/prediction_local.py:74-199``), minus its hard-coded debug TIFF dumps:

1. per-channel 1-99 percentile normalization (``:21-29``);
2. transpose (C, Y, X) -> (1, X, Y, C) — the reference's segmentation pipeline runs
   in x-major space (``:102-104``) — and front-pad to the next power of two (``:116``);
3. U-Net forward pass (Flax; bfloat16 on the MXU), unpad;
4. post-process (``:167-194``): threshold channel 0 at 0.1 -> HC mask; the
   reference's 101 dilation/erosion rounds with a 5x5 kernel are an iterated binary
   closing, which is idempotent -> a single closing; erosion(7x7); boundary =
   closed - eroded, dilated; watershed with lines -> (labels, HC mask).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tissue_image_processing_tpu.models.unet import (UNet, build_unet,
                                                     fold_batchnorm)
from tissue_image_processing_tpu.models.weights_io import load_keras_unet_weights
from tissue_image_processing_tpu.ops.brightness import normalize_channel
from tissue_image_processing_tpu.ops.morphology import (
    binary_closing, binary_dilation, binary_erosion)
from tissue_image_processing_tpu.ops.watershed import watershed, watershed_batch

__all__ = ["SegmentationPredictor", "find_desired_shape", "unet_postprocess",
           "unet_postprocess_batch"]


def find_desired_shape(shape_y: int, shape_x: int) -> Tuple[int, int]:
    """Smallest powers of two >= the given sizes (reference
    ``prediction_local.py:10-19``)."""
    def pow2(n):
        p = 1
        while p < n:
            p *= 2
        return p
    return pow2(shape_y), pow2(shape_x)


@functools.partial(jax.jit, static_argnames=("hc_threshold", "closing_kernel",
                                             "erosion_kernel"))
def unet_postprocess(predictions: jnp.ndarray, hc_threshold: float = 0.1,
                     closing_kernel: int = 5, erosion_kernel: int = 7):
    """(H, W, 2) softmax output -> (labels, HC mask) via the reference's morphology
    chain (``prediction_local.py:167-194``)."""
    p0 = predictions[..., 0]
    # Layout firewall: a Mosaic custom call pins default layouts on its
    # operands, and XLA propagates that constraint BACKWARD through
    # elementwise/morphology ops into any conv chain feeding it — every conv
    # in the program then runs in the worse layout (+20.5 ms measured on the
    # 1024^2 U-Net composed with ANY pallas call consuming its output, even a
    # trivial copy; optimization_barrier/bitcast/pad/transpose do NOT block
    # it). A dot has its own layout preference and is the one op measured to
    # stop the propagation; identity-matmul is exact (x*1 + 0-products) and
    # costs ~10 us on the MXU. Precision must be HIGHEST: the default matmul
    # precision rounds f32 operands to bf16 on TPU, and a probability rounded
    # ACROSS hc_threshold would flip the mask pixel (bf16x3 decomposes each
    # f32 operand exactly, and x*1 + 0-sums accumulate exactly in f32).
    p0 = jnp.matmul(p0, jnp.eye(p0.shape[-1], dtype=p0.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    hc_b = p0 > hc_threshold
    closed = binary_closing(hc_b, closing_kernel)
    hc = binary_erosion(closed, erosion_kernel)
    bound = closed & (~hc)
    boundary = binary_dilation(bound, closing_kernel)
    # binary=True: seeds are the 4-CC of the zero set and lam == img exactly,
    # so both the minima candidate/escape machinery (12.3 ms at 1024^2 — its
    # "escaping plateau" diffusion has to traverse the image-spanning dilated
    # boundary band) and the Bellman-Ford phase (1.8 ms) drop away; the
    # remaining cost is two zero-set CC diffusions + the settle (~4 ms).
    labels = watershed(boundary.astype(jnp.float32), watershed_line=True,
                       minima_scan=True, binary=True)
    return labels, hc


@functools.partial(jax.jit, static_argnames=("hc_threshold", "closing_kernel",
                                             "erosion_kernel"))
def unet_postprocess_batch(predictions: jnp.ndarray, hc_threshold: float = 0.1,
                           closing_kernel: int = 5, erosion_kernel: int = 7):
    """(B, H, W, 2) batched :func:`unet_postprocess` with ONE flood launch.

    The morphology vmaps cleanly (pure XLA), but vmap-of-Pallas serializes the
    flood kernel and adds ~50%/frame (bench.py batching notes) — so the B
    boundary maps go through :func:`watershed_batch`, which row-stacks them
    with +inf separators into a single Pallas launch, here with the
    ``binary=True`` fast path (zero-set seeds, no Bellman-Ford). Outputs are
    bit-identical to per-frame :func:`unet_postprocess`.
    """
    p0 = predictions[..., 0]
    p0 = jnp.matmul(p0, jnp.eye(p0.shape[-1], dtype=p0.dtype),
                    precision=jax.lax.Precision.HIGHEST)  # layout firewall (above)
    hc_b = p0 > hc_threshold
    closed = jax.vmap(lambda b: binary_closing(b, closing_kernel))(hc_b)
    hc = jax.vmap(lambda b: binary_erosion(b, erosion_kernel))(closed)
    bound = closed & (~hc)
    boundary = jax.vmap(lambda b: binary_dilation(b, closing_kernel))(bound)
    labels = watershed_batch(boundary.astype(jnp.float32), watershed_line=True,
                             minima_scan=True, binary=True)
    return labels, hc


class SegmentationPredictor:
    """Predict a (C=2, Y, X) membrane/marker frame -> (labels, HC mask), both in the
    reference's transposed (X, Y) space."""

    def __init__(self, model_weights_path: Optional[str], image_shape,
                 depth: int = 3, base_filters: int = 128, dtype=jnp.bfloat16,
                 variables=None, fold_bn: bool = True, quantize: bool = False):
        sy, sx = find_desired_shape(image_shape[-2], image_shape[-1])
        self.model_shape = (sx, sy, 2)  # x-major like the reference
        self.dtype = dtype
        self.depth = depth
        self.model = UNet(depth=depth, base_filters=base_filters, dtype=dtype)
        folded_ok = False
        if variables is None:
            _, variables = build_unet(self.model_shape, depth=depth,
                                      base_filters=base_filters, dtype=dtype)
            if model_weights_path:
                variables = load_keras_unet_weights(variables, model_weights_path)
        if fold_bn:
            folded = fold_batchnorm(variables, depth=depth)
            if folded is not None:  # None: a gamma <= 0 blocks the fold
                self.model = UNet(depth=depth, base_filters=base_filters,
                                  dtype=dtype, norm="shift")
                variables = folded
                folded_ok = True
        self.variables = variables
        # optional int8 path (models/quant.py): ~1.54x the bf16 forward
        # end-to-end on v5e (35 -> 54 fps at 1024^2, BENCH_r03);
        # activation scales calibrate lazily on the first batch seen
        # (or explicitly via calibrate()). Requires the folded (norm="shift")
        # form.
        self.quantize = quantize and folded_ok
        if quantize and not folded_ok:
            import warnings
            warnings.warn(
                "quantize=True requires the folded-BatchNorm form "
                "(fold_bn=True and all BN gammas > 0); falling back to the "
                "bf16 path", stacklevel=2)
        self._qparams = None
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def calibrate(self, image: np.ndarray) -> None:
        """Fix the int8 activation scales from a REPRESENTATIVE frame/batch
        ((C, Y, X) raw image, normalized+padded like ``predict`` inputs).
        Call once before ``predict`` when the movie's first frame is not
        representative (blank/pre-ablation frames): the lazy default
        calibrates on whatever batch arrives first and keeps those scales
        for the predictor's lifetime."""
        if not self.quantize:
            return
        from tissue_image_processing_tpu.models.quant import quantize_unet
        padded, _ = self.prepare_image(image)
        self._qparams = quantize_unet(self.variables, padded, depth=self.depth)

    def _forward(self, batch):
        if self.quantize:
            from tissue_image_processing_tpu.models.quant import (
                quantize_unet, unet_int8_apply)
            if self._qparams is None:
                # static scales: whatever arrives first defines the clip
                # range for the predictor's lifetime — flag clearly-blank
                # calibration batches instead of silently degrading
                if float(jnp.std(batch)) < 1e-3:
                    import warnings
                    warnings.warn(
                        "int8 activation scales are calibrating on a "
                        "near-constant (blank?) batch; subsequent frames "
                        "will be clipped. Call calibrate(representative_"
                        "image) first.", stacklevel=3)
                self._qparams = quantize_unet(self.variables, batch,
                                              depth=self.depth)
            return unet_int8_apply(self._qparams, batch, depth=self.depth)
        return self._apply(self.variables, batch)

    def prepare_image(self, image: np.ndarray):
        """(C, Y, X) -> front-padded (1, X', Y', C) model input
        (reference ``prepare_image``, ``prediction_local.py:90-122``)."""
        image = jnp.asarray(image)
        normalized = jax.vmap(normalize_channel)(image)
        x_major = jnp.transpose(normalized)  # (X, Y, C)
        sx, sy = x_major.shape[0], x_major.shape[1]
        px, py = find_desired_shape(sx, sy)
        npad = ((px - sx, 0), (py - sy, 0), (0, 0))
        padded = jnp.pad(x_major, npad)[None]
        return padded, ((0, 0),) + npad

    def predict(self, image: np.ndarray):
        padded, npad = self.prepare_image(image)
        pred = self._forward(padded)
        unpadded = pred[0, npad[1][0]:, npad[2][0]:, :]
        labels, hc = unet_postprocess(unpadded)
        return labels, hc

    def pipeline_config(self, batch: int = 8) -> dict:
        """Package this predictor for the fused movie pipeline
        (:func:`~..core.pipeline.movie_pipeline` ``unet=`` /
        ``cli pipeline --unet``): the parameter pytree plus the static model
        description. With ``quantize=True`` the int8 activation scales must be
        fixed first — call :meth:`calibrate` with a representative projected
        frame (the CLI projects the movie's first frame for this)."""
        if self.quantize:
            if self._qparams is None:
                raise ValueError(
                    "int8 pipeline config needs calibrated activation scales "
                    "— call calibrate(representative_image) first")
            params = self._qparams
        else:
            params = self.variables
        return {"params": params, "quantized": self.quantize,
                "depth": self.depth, "base_filters": self.model.base_filters,
                "norm": self.model.norm, "batch": batch}

    def predict_batch(self, images: jnp.ndarray):
        """(B, C, Y, X) equally-sized batch -> (B, X, Y) labels + (B, X, Y) HC —
        the TPU path for multi-frame segmentation (one forward pass, vmapped
        post-process)."""
        prepared = [self.prepare_image(i) for i in images]
        npad = prepared[0][1]
        batch = jnp.concatenate([p[0] for p in prepared], axis=0)
        preds = self._forward(batch)
        preds = preds[:, npad[1][0]:, npad[2][0]:, :]
        labels, hc = unet_postprocess_batch(preds)
        return labels, hc
