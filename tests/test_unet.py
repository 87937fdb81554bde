import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tissue_image_processing_tpu.models.unet import UNet, build_unet
from tissue_image_processing_tpu.models.predictor import (
    SegmentationPredictor, find_desired_shape, unet_postprocess)


def test_find_desired_shape():
    assert find_desired_shape(100, 257) == (128, 512)
    assert find_desired_shape(256, 256) == (256, 256)
    assert find_desired_shape(1, 1) == (1, 1)


def test_unet_shapes_and_softmax():
    model, variables = build_unet((64, 64, 2), depth=2, base_filters=8)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 2)), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_unet_train_step_reduces_loss():
    from tissue_image_processing_tpu.models.train import (
        create_train_state, make_train_step)
    model = UNet(depth=2, base_filters=8, dtype=jnp.float32)
    state, tx = create_train_state(model, (32, 32, 2), learning_rate=1e-2)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 32, 2)), jnp.float32)
    y_cls = (np.asarray(x[..., 0]) > 0.5).astype(np.float32)
    y = jnp.asarray(np.stack([y_cls, 1 - y_cls], -1))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        state, loss, acc = step(state, x, y, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_crop_generator_policy():
    from tissue_image_processing_tpu.models.train import crop_generator
    rng = np.random.default_rng(0)
    img = rng.random((2, 300, 320)).astype(np.float32)
    lab = rng.integers(1, 3, (300, 320)).astype(np.int32)
    lab[:, ::7] = 0  # some boundary
    gen = crop_generator([img], [lab], batch_size=3, crop=64)
    bx, by = next(gen)
    assert bx.shape == (3, 64, 64, 2) and by.shape == (3, 64, 64, 2)
    assert bx.max() <= 1.0 + 1e-6
    # one-hot consistency: each pixel has at most one positive channel
    assert (by.sum(-1) <= 1 + 1e-6).all()


def test_crop_generator_rejects_boundary_heavy():
    from tissue_image_processing_tpu.models.train import crop_generator
    rng = np.random.default_rng(0)
    img = rng.random((2, 300, 300)).astype(np.float32)
    lab = np.zeros((300, 300), np.int32)  # all boundary
    lab[:150] = 1  # top half usable
    gen = crop_generator([img], [lab], batch_size=2, crop=64, seed=1)
    bx, by = next(gen)
    # all crops must come from the usable half (boundary fraction < 0.3)
    assert (by.sum((1, 2, 3)) > 0.7 * 64 * 64).all()


def test_keras_weight_import_parity(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from tissue_image_processing_tpu.models.weights_io import load_keras_unet_weights

    def double_conv_block(x, n):
        x = tf.keras.layers.Conv2D(n, 3, padding="same", activation="relu")(x)
        x = tf.keras.layers.BatchNormalization(axis=-1)(x)
        x = tf.keras.layers.Conv2D(n, 3, padding="same", activation="relu")(x)
        x = tf.keras.layers.BatchNormalization(axis=-1)(x)
        return x

    def downsample_block(x, n):
        f = double_conv_block(x, n)
        p = tf.keras.layers.MaxPool2D(2)(f)
        p = tf.keras.layers.Dropout(0.3)(p)
        return f, p

    def upsample_block(x, conv_features, n):
        x = tf.keras.layers.Conv2DTranspose(n, 3, 2, padding="same")(x)
        x = tf.keras.layers.concatenate([x, conv_features])
        x = tf.keras.layers.Dropout(0.3)(x)
        return double_conv_block(x, n)

    inputs = tf.keras.layers.Input(shape=(32, 32, 2))
    f1, p1 = downsample_block(inputs, 8)
    f2, p2 = downsample_block(p1, 16)
    bottleneck = double_conv_block(p2, 32)
    u2 = upsample_block(bottleneck, f2, 16)
    u3 = upsample_block(u2, f1, 8)
    outputs = tf.keras.layers.Conv2D(2, 1, padding="same", activation="softmax")(u3)
    kmodel = tf.keras.Model(inputs, outputs)
    wpath = os.path.join(tmp_path, "w.weights.h5")
    kmodel.save_weights(wpath)

    model, variables = build_unet((32, 32, 2), depth=2, base_filters=8)
    variables = load_keras_unet_weights(variables, wpath)
    x = np.random.default_rng(0).random((1, 32, 32, 2)).astype(np.float32)
    want = kmodel(x, training=False).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_predictor_end_to_end():
    rng = np.random.default_rng(0)
    img = (rng.random((2, 100, 120)) * 60000).astype(np.float32)
    pred = SegmentationPredictor(None, img.shape, depth=2, base_filters=8,
                                 dtype=jnp.float32)
    labels, hc = pred.predict(img)
    assert labels.shape == (120, 100)  # x-major, reference convention
    assert hc.shape == (120, 100)
    assert int(jnp.max(labels)) >= 1


def test_unet_postprocess_geometry():
    # synthetic prediction: two HC blobs on class-0 channel
    pred = np.zeros((64, 64, 2), np.float32)
    pred[..., 1] = 1.0
    pred[8:24, 8:24, 0] = 0.9
    pred[40:60, 30:60, 0] = 0.9
    labels, hc = unet_postprocess(jnp.asarray(pred))
    hc = np.asarray(hc)
    assert hc[12, 12] and hc[50, 45]
    assert not hc[0, 0]
    lab = np.asarray(labels)
    assert lab.max() >= 2  # at least both blobs and background separated


def test_predictor_batch():
    rng = np.random.default_rng(0)
    imgs = (rng.random((3, 2, 60, 70)) * 50000).astype(np.float32)
    pred = SegmentationPredictor(None, imgs[0].shape, depth=2, base_filters=8,
                                 dtype=jnp.float32)
    labels, hc = pred.predict_batch(imgs)
    assert labels.shape == (3, 70, 60)
    assert hc.shape == (3, 70, 60)
    l0, h0 = pred.predict(imgs[0])
    np.testing.assert_array_equal(np.asarray(labels[0]), np.asarray(l0))


def test_subpixel_up_matches_convtranspose():
    """UNet(up_kind="subpixel") with folded weights is bit-equivalent to the
    reference ConvTranspose architecture (phase decomposition of the stride-2
    transposed conv; see _SubpixelUp / fold_convtranspose_kernel)."""
    import numpy as np
    import jax.numpy as jnp
    from tissue_image_processing_tpu.models.unet import (
        UNet, build_unet, variables_to_subpixel)

    model, variables = build_unet((64, 64, 2), depth=2, base_filters=8)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 2)), jnp.float32)
    want = model.apply(variables, x, train=False)
    sub = UNet(depth=2, base_filters=8, up_kind="subpixel")
    got = sub.apply(variables_to_subpixel(variables), x, train=False)
    assert float(jnp.abs(want - got).max()) < 1e-5


def test_fold_batchnorm_matches_bn():
    """UNet(norm="shift") with fold_batchnorm'd weights reproduces the BN
    inference model: the BN scale commutes back through the ReLU into its
    conv's output channels (a > 0), leaving only the per-channel shift."""
    import jax
    import jax.tree_util as tu
    from tissue_image_processing_tpu.models.unet import (
        UNet, build_unet, fold_batchnorm)

    model, variables = build_unet((64, 64, 2), depth=2, base_filters=8)
    key = jax.random.PRNGKey(1)

    def perturb(path, x):  # make BN stats/affine non-trivial
        k2 = jax.random.fold_in(key, hash(str(path)) % (2 ** 31))
        return x + jax.random.uniform(k2, x.shape, x.dtype, 0.01, 0.5)

    variables = {
        "params": tu.tree_map_with_path(
            lambda p, x: perturb(p, x)
            if "scale" in str(p) or "bias" in str(p) else x,
            variables["params"]),
        "batch_stats": tu.tree_map_with_path(perturb,
                                             variables["batch_stats"]),
    }
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 2)),
                    jnp.float32)
    want = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables, depth=2)
    assert folded is not None
    got = UNet(depth=2, base_filters=8, norm="shift").apply(
        folded, x, train=False)
    assert float(jnp.abs(want - got).max()) < 1e-5

    # a gamma <= 0 must refuse the fold (ReLU commute needs a > 0)
    bad = jax.tree_util.tree_map(lambda x: x, variables)
    bad["params"] = dict(bad["params"])
    bad["params"]["DoubleConv_0"] = dict(bad["params"]["DoubleConv_0"])
    bad["params"]["DoubleConv_0"]["BatchNorm_0"] = {
        "scale": variables["params"]["DoubleConv_0"]["BatchNorm_0"]["scale"]
        * -1.0,
        "bias": variables["params"]["DoubleConv_0"]["BatchNorm_0"]["bias"],
    }
    assert fold_batchnorm(bad, depth=2) is None


def test_unet_postprocess_batch_matches_per_frame():
    """unet_postprocess_batch (one stacked binary flood launch) must be
    bit-identical to per-frame unet_postprocess. (The stacked Pallas binary
    flood itself is parity-tested in interpret mode by
    test_watershed_batch_binary_matches_per_frame; on the CPU suite this
    exercises the XLA fallback branch.)"""
    import importlib
    P = importlib.import_module("tissue_image_processing_tpu.models.predictor")

    rng = np.random.default_rng(3)
    preds = np.zeros((2, 128, 128, 2), np.float32)
    preds[..., 1] = 1.0
    for b in range(2):
        for _ in range(6):
            y, x = rng.integers(10, 110, 2)
            preds[b, y:y + 14, x:x + 14, 0] = 0.9
    pb = jnp.asarray(preds)
    want = [P.unet_postprocess(pb[i]) for i in range(2)]
    got = P.unet_postprocess_batch(pb)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(got[0][i]),
                                      np.asarray(want[i][0]))
        np.testing.assert_array_equal(np.asarray(got[1][i]),
                                      np.asarray(want[i][1]))


def test_quant_f32_twin_matches_model_apply():
    """quant._forward reimplements the UNet(norm="shift") inference wiring;
    the f32 twin must match model.apply exactly (same ops, same order)."""
    from tissue_image_processing_tpu.models.quant import unet_f32_apply
    from tissue_image_processing_tpu.models.unet import (UNet, build_unet,
                                                         fold_batchnorm)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 2), np.float32))
    _, variables = build_unet((64, 64, 2), depth=2, base_filters=8,
                              dtype=jnp.float32)
    folded = fold_batchnorm(variables, depth=2)
    model = UNet(depth=2, base_filters=8, dtype=jnp.float32, norm="shift")
    want = np.asarray(model.apply(folded, x, train=False))
    got = np.asarray(unet_f32_apply(folded, x, depth=2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_quantized_unet_close_to_float():
    """int8 post-training quantization: probabilities within quantization
    noise of the float forward on the calibration distribution."""
    from tissue_image_processing_tpu.models.quant import (quantize_unet,
                                                          unet_f32_apply,
                                                          unet_int8_apply)
    from tissue_image_processing_tpu.models.unet import (build_unet,
                                                         fold_batchnorm)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 64, 2), np.float32))
    _, variables = build_unet((64, 64, 2), depth=2, base_filters=8,
                              dtype=jnp.float32)
    folded = fold_batchnorm(variables, depth=2)
    q = quantize_unet(folded, x, depth=2)
    want = np.asarray(unet_f32_apply(folded, x, depth=2))
    got = np.asarray(unet_int8_apply(q, x, depth=2))
    err = np.abs(got - want).mean()
    assert err < 0.02, f"mean |dP| = {err:.4f}"
    # same class argmax on the overwhelming majority of pixels
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.98, f"argmax agreement {agree:.4f}"


def test_int8_split_conv_identity():
    """The skip-concat split conv the int8 path relies on is an exact i32
    identity: conv(concat([a, b]), W) = conv(a, W[:, :, :Ca]) +
    conv(b, W[:, :, Ca:]) — no rounding involved."""
    from tissue_image_processing_tpu.models.quant import _conv_s8

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (1, 16, 16, 3)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (1, 16, 16, 5)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 4)), jnp.int8)
    full = _conv_s8(jnp.concatenate([a, b], axis=-1), w)
    split = _conv_s8(a, w[:, :, :3]) + _conv_s8(b, w[:, :, 3:])
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))


def test_predictor_quantized_path():
    """SegmentationPredictor(quantize=True) calibrates lazily and produces
    probabilities (hence labels) close to the bf16/f32 path."""
    rng = np.random.default_rng(0)
    imgs = (rng.random((2, 2, 60, 70)) * 50000).astype(np.float32)
    kw = dict(depth=2, base_filters=8, dtype=jnp.float32)
    p_f = SegmentationPredictor(None, imgs[0].shape, **kw)
    p_q = SegmentationPredictor(None, imgs[0].shape, quantize=True, **kw)
    assert p_q.quantize  # fold succeeded -> int8 path active
    lf, hf = p_f.predict_batch(imgs)
    lq, hq = p_q.predict_batch(imgs)
    assert p_q._qparams is not None
    # the HC masks (thresholded probabilities + morphology) must agree almost
    # everywhere; label maps derive from them
    agree = (np.asarray(hf) == np.asarray(hq)).mean()
    assert agree > 0.97, f"HC mask agreement {agree:.4f}"


def test_row_split_conv_exact():
    """The space-to-batch halo conv (_FusedConv row_split) must equal the
    unsplit SAME conv exactly, for fixed S and auto mode, and
    _auto_row_split must search past non-dividing candidates."""
    from tissue_image_processing_tpu.models.unet import (DoubleConv,
                                                         _auto_row_split)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 256, 256, 2), np.float32))
    dc = DoubleConv(8, dtype=jnp.float32, norm="none", row_split=1)
    v = dc.init(jax.random.PRNGKey(0), x, train=False)
    want = dc.apply(v, x, train=False)
    for rs in (8, -1):
        got = DoubleConv(8, dtype=jnp.float32, norm="none",
                         row_split=rs).apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
    # batched input too (B=2 -> auto S=4 at H=512)
    xb = jnp.asarray(rng.random((2, 512, 256, 2), np.float32))
    vb = dc.init(jax.random.PRNGKey(1), xb, train=False)
    want_b = dc.apply(vb, xb, train=False)
    got_b = DoubleConv(8, dtype=jnp.float32, norm="none",
                       row_split=-1).apply(vb, xb, train=False)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=1e-5, rtol=1e-5)
    assert _auto_row_split(1, 1024) == 8
    assert _auto_row_split(3, 1024) == 4   # 3 does not divide 1024 -> next S
    assert _auto_row_split(8, 1024) == 1   # batch already saturates tilings
    assert _auto_row_split(1, 384) == 1    # no S with >= 128 rows per slice


@pytest.mark.slow
def test_int8_real_architecture_end_to_end():
    """Certify the int8 path on the REAL product architecture (depth 3,
    128 base filters — reference prediction_local.py:60-72): full predictor
    surface (forward + morphology post + watershed) on a synthetic membrane
    frame, int8 vs f32. Promoted from the round-3 scratch probe
    (probe_verify_int8.py); the at-scale Dice certificate runs on TPU in
    bench.py (dice_int8_vs_bf16)."""
    from conftest import make_cell_image

    h = w = 256
    mem = make_cell_image(h, w, n_seeds=30, seed=3)
    rng = np.random.default_rng(0)
    marker = (0.3 * mem + 0.1 * rng.random((h, w))).astype(np.float32)
    image = np.stack([marker, mem])  # (C=2, Y, X)

    # build_unet init is seed-deterministic, so both predictors share weights
    p_f = SegmentationPredictor(None, image.shape, dtype=jnp.float32)
    p_q = SegmentationPredictor(None, image.shape, dtype=jnp.float32,
                                quantize=True)
    assert p_q.quantize, "int8 path did not activate"

    lab_f, hc_f = p_f.predict(image)
    lab_q, hc_q = p_q.predict(image)
    hc_agree = float((np.asarray(hc_f) == np.asarray(hc_q)).mean())

    # probability agreement at the forward boundary (labels are degenerate
    # under random weights, probabilities are not)
    padded, _ = p_f.prepare_image(image)
    pf = np.asarray(p_f._forward(padded))
    pq = np.asarray(p_q._forward(padded))
    dp = float(np.abs(pf - pq).mean())
    assert hc_agree > 0.98, f"HC mask agreement {hc_agree:.4f}"
    assert dp < 0.05, f"forward mean |dP| {dp:.4f}"


@pytest.mark.slow
def test_train_unet_converges_on_synthetic(tmp_path):
    """Convergence receipt: train_unet (the reference recipe's loop,
    Segmentation/train.py:179-195, shrunk net) must learn a usable
    segmentation on synthetic HC/SC data — post-postprocess HC-mask Dice
    >= 0.9 on a held-out frame, not just 'loss went down'."""
    from tissue_image_processing_tpu.models.train import train_unet
    from tissue_image_processing_tpu.models.predictor import unet_postprocess

    rng = np.random.default_rng(0)

    def make_frame(seed):
        """(2, Y, X) image + (Y, X) labels (1 HC / 2 SC incl. boundary) + the
        ground-truth HC mask. Channel 0 = HC marker, channel 1 = membrane.
        Boundary pixels are labeled SC here so every pixel is supervised —
        the reference's 0-label leaves boundaries lossless
        (``train.py:109-111``), which a receptive-field-starved smoke-size
        net fills arbitrarily; the crop-reject policy around 0-labels has
        its own test above."""
        from scipy.ndimage import gaussian_filter
        from scipy.spatial import cKDTree

        r = np.random.default_rng(seed)
        H = W = 160
        pts = np.stack([r.uniform(0, H, 48), r.uniform(0, W, 48)], 1)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        d, idx = cKDTree(pts).query(np.stack([yy.ravel(), xx.ravel()], 1), k=2)
        boundary = (d[:, 1] - d[:, 0]).reshape(H, W) < 1.5
        owner = idx[:, 0].reshape(H, W)
        hc_cells = r.random(48) < 0.4
        truth_hc = (~boundary) & hc_cells[owner]
        lab = np.where(truth_hc, 1, 2)
        img = np.zeros((2, H, W), np.float32)
        img[0] = gaussian_filter(truth_hc.astype(np.float32), 0.5) * 900
        img[1] = gaussian_filter(boundary.astype(np.float32), 0.5) * 800
        img += r.normal(0, 20, img.shape)
        return np.clip(img, 0, None), lab, truth_hc

    frames = [make_frame(s) for s in range(3)]
    images = [f[0] for f in frames]
    labels = [f[1] for f in frames]
    model, variables, history = train_unet(
        images, labels, epochs=15, steps_per_epoch=8, batch_size=8, crop=64,
        learning_rate=1e-3, depth=2, base_filters=8, dtype=jnp.float32,
        seed=0)
    assert history["loss"][-1] < history["loss"][0]

    # held-out frame -> predict -> postprocess; compare against the ground
    # truth pushed through the IDENTICAL postprocess (same 0.1 threshold,
    # closing and 7x7 erosion on both sides isolates the model's quality
    # from the morphology's deliberate mask shrink)
    img_t, _lab_t, truth = make_frame(99)
    from tissue_image_processing_tpu.ops.brightness import normalize_channel

    norm = jax.vmap(normalize_channel)(jnp.asarray(img_t[:, :128, :128]))
    x = jnp.transpose(norm)[None]                       # (1, X, Y, C)
    pred = model.apply(variables, x, train=False)[0]
    _labels, hc = unet_postprocess(pred.astype(jnp.float32))
    hc = np.asarray(hc).T                               # back to (Y, X)
    t = jnp.asarray(truth[:128, :128].astype(np.float32).T)
    _, hc_oracle = unet_postprocess(jnp.stack([t, 1 - t], -1))
    hc_oracle = np.asarray(hc_oracle).T
    inter = np.logical_and(hc, hc_oracle).sum()
    dice = 2 * inter / max(hc.sum() + hc_oracle.sum(), 1)
    print(f"\nconvergence smoke: post-postprocess HC Dice {dice:.3f} "
          f"(loss {history['loss'][0]:.3f} -> {history['loss'][-1]:.3f})")
    assert dice >= 0.9, dice
