import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from tissue_image_processing_tpu.ops.watershed import (
    regional_minima_labels, watershed, watershed_batch, watershed_segmentation)
from tissue_image_processing_tpu.ops.drift import phase_cross_correlation, calculate_drift
from tissue_image_processing_tpu.ops.brightness import (
    set_channel_brightness, normalize_channel, binary_image)
from conftest import make_cell_image
from oracles import meyer_watershed, regional_minima


def best_dice(got, want):
    """Mean best-match Dice between label maps (cells only)."""
    dices = []
    for l in range(1, want.max() + 1):
        wm = want == l
        if wm.sum() < 20:
            continue
        cand = np.bincount(got[wm].ravel())
        cand[0] = 0
        if cand.size <= 1 or cand.max() == 0:
            dices.append(0.0)
            continue
        g = cand.argmax()
        gm = got == g
        dices.append(2 * np.logical_and(wm, gm).sum() / (wm.sum() + gm.sum()))
    return np.mean(dices)


def test_regional_minima_matches_oracle(rng):
    img = ndi.gaussian_filter(rng.random((48, 48)), 2.0)
    got = np.asarray(regional_minima_labels(jnp.asarray(img.astype(np.float32))))
    want = regional_minima(img.astype(np.float32))
    np.testing.assert_array_equal(got > 0, want)


def test_watershed_partition_properties():
    img = make_cell_image(96, 96, n_seeds=12, seed=3)
    blurred = ndi.gaussian_filter(np.where(img < 0.2 * img.max(), 0, img), 3.0)
    lab = np.asarray(watershed(jnp.asarray(blurred.astype(np.float32))))
    n = lab.max()
    assert n >= 5
    # labels are consecutive
    assert set(np.unique(lab)) == set(range(0, n + 1))
    # watershed line separates distinct labels: no two 4-adjacent pixels differ in
    # nonzero label
    for dy, dx in [(0, 1), (1, 0)]:
        a = lab[max(dy, 0):lab.shape[0] - max(-dy, 0) or None, max(dx, 0):]
        b = lab[:lab.shape[0] - dy, :lab.shape[1] - dx]
        both = (a > 0) & (b > 0)
        assert np.all(a[both] == b[both])


def test_watershed_dice_vs_meyer_oracle():
    img = make_cell_image(96, 96, n_seeds=12, seed=5)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = ndi.gaussian_filter(seg.astype(np.float32), 3.0).astype(np.float32)
    got = np.asarray(watershed(jnp.asarray(blurred)))
    want = meyer_watershed(blurred)
    d = best_dice(got, want)
    assert d > 0.985, f"Dice {d:.4f} vs Meyer oracle too low"


def test_watershed_segmentation_end_to_end():
    img = make_cell_image(128, 128, n_seeds=20, seed=7)
    lab = np.asarray(watershed_segmentation(jnp.asarray(img), 0.2, 3.0, 41))
    # should find roughly the seeded number of cells
    sizes = np.bincount(lab.ravel())[1:]
    big = (sizes > 100).sum()
    assert 12 <= big <= 28


def test_phase_correlation_integer_shift(rng):
    # content displaced by (+5, -7): the registration shift (skimage convention,
    # "what to add to the second image to get the first") is (-5, +7)
    img = ndi.gaussian_filter(rng.random((64, 64)), 2.0).astype(np.float32)
    shifted = np.roll(img, (5, -7), axis=(0, 1))
    dy, dx = np.asarray(phase_cross_correlation(jnp.asarray(img), jnp.asarray(shifted)))
    assert abs(dy + 5) < 0.1 and abs(dx - 7) < 0.1


def test_phase_correlation_subpixel(rng):
    img = ndi.gaussian_filter(rng.random((128, 128)), 3.0)
    true = (2.37, -1.82)
    shifted = np.real(np.fft.ifft2(ndi.fourier_shift(np.fft.fft2(img), true)))
    dy, dx = np.asarray(calculate_drift(jnp.asarray(img.astype(np.float32)),
                                        jnp.asarray(shifted.astype(np.float32))))
    assert abs(dy + true[0]) < 0.05, (dy, dx)
    assert abs(dx + true[1]) < 0.05, (dy, dx)


def test_set_channel_brightness_matches_reference_logic(rng):
    img = (rng.random((40, 40)) * 65535).astype(np.float64)
    got = np.asarray(set_channel_brightness(jnp.asarray(img), 65535.0, "bestFit", 1.0, 0.0))
    # numpy oracle (reference basic_image_manipulations.py:303-348, gamma=1 no-op)
    x = img.copy()
    new_max = np.percentile(x, 99)
    new_min = np.percentile(x, 1)
    x[x > new_max] = new_max
    x = x - new_min
    x = x / x.max()
    x = x + 1 / 65535.0
    x[x < 0] = 0
    np.testing.assert_allclose(got, x, atol=1e-4)


def test_normalize_channel(rng):
    img = (rng.random((30, 30)) * 1000).astype(np.float32)
    got = np.asarray(normalize_channel(jnp.asarray(img)))
    p99, p1 = np.percentile(img, 99), np.percentile(img, 1)
    want = (np.clip(img, p1, p99) - p1) / (p99 - p1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_binary_image(rng):
    img = rng.random((3, 10, 10)).astype(np.float32)
    out = np.asarray(binary_image(img, [0.3, 0.5, 0.7], channel_axis=0))
    for c, t in enumerate([0.3, 0.5, 0.7]):
        np.testing.assert_array_equal(out[c] > 0.5, img[c] > t)


def test_native_watershed_matches_python_oracle():
    from tissue_image_processing_tpu.native import (
        meyer_watershed_native, native_available)
    if not native_available():
        import pytest
        pytest.skip("no g++ toolchain")
    img = make_cell_image(96, 96, n_seeds=12, seed=5)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = ndi.gaussian_filter(seg.astype(np.float32), 3.0).astype(np.float32)
    got = meyer_watershed_native(blurred)
    want = meyer_watershed(blurred)
    # same minima, same labels up to heap tie-breaks at plateau boundaries
    assert got.max() == want.max()
    agree = (got == want).mean()
    assert agree > 0.99, agree


def test_tpu_watershed_dice_vs_native_large():
    from tissue_image_processing_tpu.native import (
        meyer_watershed_native, native_available)
    if not native_available():
        import pytest
        pytest.skip("no g++ toolchain")
    img = make_cell_image(256, 256, n_seeds=80, seed=11)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = ndi.gaussian_filter(seg.astype(np.float32), 3.0).astype(np.float32)
    got = np.asarray(watershed(jnp.asarray(blurred)))
    want = meyer_watershed_native(blurred)
    d = best_dice(got, want)
    assert d > 0.98, f"Dice {d:.4f} vs native Meyer flood"


def test_watershed_pallas_path_matches_xla():
    # run the pallas flood kernels in interpret mode on CPU and compare with the
    # XLA path bit-for-bit
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    import tissue_image_processing_tpu.ops.watershed as WS_mod
    import importlib
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
    from jax.experimental import pallas as pl
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 128, n_seeds=15, seed=9)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0)
                          .astype(np.float32))
    want = np.asarray(WS.watershed(blurred, use_pallas=False))
    FP.pl.pallas_call = interp_call
    try:
        # unjitted call: the monkeypatched pallas_call must be live at trace time
        got = np.asarray(WS.watershed.__wrapped__(blurred, use_pallas=True))
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(got, want)


def test_cc_diffusion_pallas_matches_cc():
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.components import (
        connected_components, relabel_sequential)
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    rng = np.random.default_rng(3)
    mask = rng.random((128, 128)) < 0.5
    FP.pl.pallas_call = interp_call
    try:
        got = np.asarray(relabel_sequential(
            FP.cc_diffusion_pallas(jnp.asarray(mask)), background=-1))
    finally:
        FP.pl.pallas_call = orig_call
    want = np.asarray(connected_components(jnp.asarray(mask), connectivity=1))
    np.testing.assert_array_equal(got, want)


def test_cc_scan_matches_sweep():
    # the segmented-scan cc kernel must equal the sweep kernels bit-for-bit
    # (same schedule-independent fixpoint) — on a percolation mask, a giant
    # binary sea (the unet_postprocess structure it exists for), and a spiral
    # (worst-case staircase count: one HV iteration per turn)
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    rng = np.random.default_rng(5)
    perc = rng.random((128, 128)) < 0.5
    sea = np.ones((128, 128), bool)
    sea[20:40, :100] = False
    sea[60:110, 30:31] = False
    spiral = np.zeros((128, 128), bool)
    lo, hi = 0, 127
    while lo < hi - 8:  # one-pixel spiral corridor
        spiral[lo, lo:hi] = True
        spiral[lo:hi, hi] = True
        spiral[hi, lo + 4:hi] = True
        spiral[lo + 4:hi, lo] = True
        lo, hi = lo + 4, hi - 4
    # contract shared by both forms: init < H*W (the sweep kernels use H*W as
    # the out-of-mask sentinel, so larger inits would take the sentinel as a
    # component min; real callers pass idx or idx - n)
    init = rng.integers(0, 128 * 128, (128, 128)).astype(np.int32)
    FP.pl.pallas_call = interp_call
    try:
        for mask in (perc, sea, spiral):
            got = np.asarray(FP.cc_diffusion_pallas(
                jnp.asarray(mask), init=jnp.asarray(init), scan=True))
            want = np.asarray(FP.cc_diffusion_pallas(
                jnp.asarray(mask), init=jnp.asarray(init), scan=False))
            np.testing.assert_array_equal(got, want)
    finally:
        FP.pl.pallas_call = orig_call


def _stage_jump_pair(shift=(150, -100), size=256, seed=7):
    """Non-circular translation: new random content enters the vacated region,
    so plain phase correlation sees only the (small) true overlap."""
    rng = np.random.default_rng(seed)
    big = ndi.gaussian_filter(rng.random((size * 3, size * 3)), 1.0)
    y0 = x0 = size  # frame A window
    a = big[y0:y0 + size, x0:x0 + size]
    # positive drift = shift to ADD to current to get previous: current window
    # moves by +shift in scene coordinates
    b = big[y0 + shift[0]:y0 + shift[0] + size, x0 + shift[1]:x0 + shift[1] + size]
    return a.astype(np.float32), b.astype(np.float32)


def test_refine_drift_with_stage_prior_beats_plain():
    from tissue_image_processing_tpu.ops.drift import refine_drift
    true = (150, -100)
    a, b = _stage_jump_pair(true)
    # a noisy stage prior (±3 px) still lands the refinement
    ref = refine_drift(a, b, coarse_dy=true[0] + 2.4, coarse_dx=true[1] - 2.9)
    assert abs(ref[0] - true[0]) < 0.5 and abs(ref[1] - true[1]) < 0.5, ref
    plain = np.asarray(phase_cross_correlation(jnp.asarray(a), jnp.asarray(b),
                                               upsample_factor=100))
    plain_err = max(abs(plain[0] - true[0]), abs(plain[1] - true[1]))
    # the jump exceeds what plain phase correlation recovers on this content
    assert plain_err > 5.0, f"plain unexpectedly succeeded: {plain}"


def test_drift_chain_with_stage_priors():
    from tissue_image_processing_tpu.ops.drift import drift_chain_with_stage_priors
    rng = np.random.default_rng(3)
    size = 256
    big = ndi.gaussian_filter(rng.random((size * 4, size * 4)), 1.0).astype(np.float32)
    jumps = np.array([[0, 0], [120, 60], [-90, 140]], float)
    pos = np.cumsum(jumps, axis=0) + size
    frames = np.stack([big[int(y):int(y) + size, int(x):int(x) + size]
                       for y, x in pos])
    noisy = jumps + rng.normal(0, 1.5, jumps.shape)
    noisy[0] = 0
    drifts = drift_chain_with_stage_priors(frames, noisy)
    assert np.allclose(drifts[0], 0)
    assert np.abs(drifts[1:] - jumps[1:]).max() < 0.5, drifts


def test_watershed_pallas_padded_matches_xla_unaligned():
    """Unaligned shapes (reference movies are 1600-2000 px) pad to the next
    (64, 128)-aligned size with +inf and crop back — labels in the real region
    must match the XLA path exactly."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    import importlib
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(150, 200, n_seeds=18, seed=5)[:150, :170]
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0)
                          .astype(np.float32))
    want = np.asarray(WS.watershed(blurred, use_pallas=False))
    FP.pl.pallas_call = interp_call
    try:
        got = np.asarray(WS.watershed.__wrapped__(blurred, use_pallas=True))
    finally:
        FP.pl.pallas_call = orig_call
    assert got.shape == want.shape == (150, 170)
    agree = (got == want).mean()
    assert agree > 0.999, f"padded pallas vs XLA agreement {agree:.5f}"


def test_watershed_batch_stacked_matches_per_frame():
    """B frames flooded in ONE stacked pallas launch must match the per-frame
    XLA path bit-for-bit after the per-frame label-offset subtraction."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    import importlib
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    frames = []
    for s in (1, 4, 9):
        img = make_cell_image(128, 128, n_seeds=15, seed=s)
        seg = np.where(img < 0.2 * img.max(), 0, img)
        frames.append(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    batch = jnp.asarray(np.stack(frames))
    want = np.stack([np.asarray(WS.watershed(batch[i], use_pallas=False))
                     for i in range(3)])
    FP.pl.pallas_call = interp_call
    try:
        got = np.asarray(WS.watershed_batch.__wrapped__(batch, use_pallas=True))
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(got, want)


def test_watershed_batch_chunked_matches_per_frame():
    """When the full B-stack exceeds the VMEM cap, watershed_batch splits into
    the largest fitting sub-stacks (lax.map of one Pallas launch each, plus a
    smaller stacked remainder launch for non-divisor chunk sizes) — still
    bit-identical to the per-frame path. The cap is shrunk via monkeypatch so
    the B=5 128^2 stack overflows and chunks as 3+2."""
    import importlib

    import tissue_image_processing_tpu.ops.flood_pallas as FP
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
    orig_call = FP.pl.pallas_call
    orig_sup = FP.pallas_flood_supported

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    def small_cap(shape):
        H, W = shape
        return orig_sup(shape) and H * W <= 3 * (128 + 16) * 128

    frames = []
    for s in (1, 4, 9, 11, 13):
        img = make_cell_image(128, 128, n_seeds=15, seed=s)
        seg = np.where(img < 0.2 * img.max(), 0, img)
        frames.append(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    batch = jnp.asarray(np.stack(frames))
    want = np.stack([np.asarray(WS.watershed(batch[i], use_pallas=False))
                     for i in range(5)])
    FP.pl.pallas_call = interp_call
    FP.pallas_flood_supported = small_cap
    try:
        got = np.asarray(WS.watershed_batch.__wrapped__(batch, use_pallas=True))
    finally:
        FP.pl.pallas_call = orig_call
        FP.pallas_flood_supported = orig_sup
        # the recursive sub-stack call goes through the JITTED watershed_batch
        # — drop its cache so no interpret-mode trace leaks into other tests
        WS.watershed_batch._clear_cache()
    np.testing.assert_array_equal(got, want)


def test_watershed_batch_xla_fallback_matches_per_frame():
    img = make_cell_image(96, 96, n_seeds=10, seed=2)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = ndi.gaussian_filter(seg.astype(np.float32), 3.0)
    batch = jnp.asarray(np.stack([blurred, blurred[::-1].copy()]))
    got = np.asarray(watershed_batch(batch, use_pallas=False))
    want = np.stack([np.asarray(watershed(batch[i], use_pallas=False))
                     for i in range(2)])
    np.testing.assert_array_equal(got, want)


def test_settle_bulk_prologue_bit_identical():
    """The static ungated bulk prologue + gated tail must equal the pure
    gated loop settle bit-for-bit (labels AND arrival stamps), for any
    bulk_sweeps — including past full convergence."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 128, n_seeds=15, seed=4)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    FP.pl.pallas_call = interp_call
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam = FP.bf_flood_pallas.__wrapped__(b, seeds)
        l0, t0 = FP.settle_pallas.__wrapped__(lam, seeds, bulk_sweeps=0)
        # 150 > any settle chain at 128^2, so the last case runs the bulk
        # prologue past full convergence (tail sees zero work)
        for k in (8, 24, 150):
            lk, tk = FP.settle_pallas.__wrapped__(lam, seeds, bulk_sweeps=k)
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(lk))
            np.testing.assert_array_equal(np.asarray(t0), np.asarray(tk))
    finally:
        FP.pl.pallas_call = orig_call


def test_settle_packed_matches_unpacked():
    """The packed single-word settle (dense_labels=True: (t << 21) | (lbl+2)
    in one i32 plane) equals the unpacked two-plane settle bit-for-bit —
    labels AND arrival stamps — for any bulk_sweeps, including past full
    convergence."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 256, n_seeds=25, seed=13)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    FP.pl.pallas_call = interp_call
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam = FP.bf_flood_pallas.__wrapped__(b, seeds)
        l1, t1 = FP.settle_pallas.__wrapped__(lam, seeds, dense_labels=False)
        for bulk in (0, 8, 24, 150):
            l2, t2 = FP.settle_pallas.__wrapped__(lam, seeds,
                                                  dense_labels=True,
                                                  bulk_sweeps=bulk)
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
            np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    finally:
        FP.pl.pallas_call = orig_call


def test_settle_packed_stamp_overflow_falls_back():
    """When the settle needs more sweeps than the packed 10-bit stamps can
    represent, the lax.cond fallback must rerun the unpacked settle and return
    the identical result. Exercised by shrinking the stamp cap below this
    image's real sweep count (the production cap of 1022 would need a
    ~1022-px monotone chain — minutes in interpret mode)."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 128, n_seeds=15, seed=9)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    FP.pl.pallas_call = interp_call
    orig_big = FP._PACK_T_BIG
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam = FP.bf_flood_pallas.__wrapped__(b, seeds)
        l1, t1 = FP.settle_pallas.__wrapped__(lam, seeds, dense_labels=False)
        t1n = np.asarray(t1)
        assert int(t1n[t1n < (1 << 29)].max()) > 40  # shrunken cap must bind
        FP._PACK_T_BIG = 40
        l2, t2 = FP.settle_pallas.__wrapped__(lam, seeds, dense_labels=True,
                                              bulk_sweeps=8)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    finally:
        FP._PACK_T_BIG = orig_big
        FP.pl.pallas_call = orig_call


def test_settle_2d_tiled_matches_1d():
    """The 2D tile-gated settle tail (column stripes + 3x3 flag dilation)
    equals the 1D row-gated tail bit-for-bit — labels AND arrival stamps —
    for any (cblock, bulk_sweeps). Uses a non-square image so row/column
    bookkeeping can't alias."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 256, n_seeds=25, seed=7)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    FP.pl.pallas_call = interp_call
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam = FP.bf_flood_pallas.__wrapped__(b, seeds)
        l1, t1 = FP.settle_pallas.__wrapped__(lam, seeds, cblock=0)
        for cblock in (64, 128):
            for bulk in (0, 24):
                l2, t2 = FP.settle_pallas.__wrapped__(
                    lam, seeds, cblock=cblock, bulk_sweeps=bulk)
                np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
                np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    finally:
        FP.pl.pallas_call = orig_call


def test_diffusion_unrolled_matches_loop_form():
    """BF flood and CC diffusion give bit-identical results from the unrolled
    (static-index, small-shape) and loop (dynamic-block, big-shape) kernel
    forms."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 128, n_seeds=15, seed=6)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    rng = np.random.default_rng(11)
    mask = jnp.asarray(rng.random((128, 128)) < 0.5)
    FP.pl.pallas_call = interp_call
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam_u = FP.bf_flood_pallas.__wrapped__(b, seeds, force_loop=False)
        lam_l = FP.bf_flood_pallas.__wrapped__(b, seeds, force_loop=True,
                                               bulk_sweeps=0)
        lam_bk = FP.bf_flood_pallas.__wrapped__(b, seeds, force_loop=True,
                                                bulk_sweeps=8)
        cc_u = FP.cc_diffusion_pallas.__wrapped__(mask, force_loop=False)
        cc_l = FP.cc_diffusion_pallas.__wrapped__(mask, force_loop=True,
                                                  bulk_sweeps=0)
        cc_bk = FP.cc_diffusion_pallas.__wrapped__(mask, force_loop=True,
                                                   bulk_sweeps=8)
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(np.asarray(lam_u), np.asarray(lam_l))
    np.testing.assert_array_equal(np.asarray(lam_u), np.asarray(lam_bk))
    np.testing.assert_array_equal(np.asarray(cc_u), np.asarray(cc_l))
    np.testing.assert_array_equal(np.asarray(cc_u), np.asarray(cc_bk))


def test_settle_loop_kernel_block_size_invariant():
    """The settle output (incl. arrival stamps) is bit-identical for any valid
    (block, sweep_batch <= block) — the batch-gating exactness argument is
    block-size independent."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 128, n_seeds=15, seed=3)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    FP.pl.pallas_call = interp_call
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam = FP.bf_flood_pallas.__wrapped__(b, seeds)
        l1, t1 = FP.settle_pallas.__wrapped__(lam, seeds)
        l2, t2 = FP.settle_pallas.__wrapped__(lam, seeds, block=64,
                                              sweep_batch=32)
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def _boundary_map(n=128, seed=11, width=3):
    """A realistic {0,1} boundary map: dilated watershed lines of a cell image
    — the exact structure ``unet_postprocess`` feeds the flood (image-spanning
    positive band, zero-plateau cell interiors + background sea)."""
    img = make_cell_image(n, n, n_seeds=14, seed=seed)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    blurred = ndi.gaussian_filter(seg.astype(np.float32), 3.0)
    lab = np.asarray(watershed(jnp.asarray(blurred)))
    bound = ndi.binary_dilation(lab == 0, np.ones((width, width), bool))
    return jnp.asarray(bound.astype(np.float32))


def test_watershed_binary_matches_generic_xla():
    """On a {0,1} map, seeds are the zero-set 4-CCs and lam == img, so the
    binary fast path must be BIT-exact vs the generic path (incl. with the
    scan-based minima the unet_postprocess call uses)."""
    b = _boundary_map()
    want = np.asarray(watershed(b, use_pallas=False))
    got = np.asarray(watershed(b, use_pallas=False, binary=True))
    np.testing.assert_array_equal(got, want)
    got_scan = np.asarray(watershed(b, use_pallas=False, minima_scan=True,
                                    binary=True))
    np.testing.assert_array_equal(got_scan, want)


def test_regional_minima_binary_matches_generic():
    b = _boundary_map(seed=4)
    want = np.asarray(regional_minima_labels(b, use_pallas=False))
    got = np.asarray(regional_minima_labels(b, use_pallas=False, binary=True))
    np.testing.assert_array_equal(got, want)


def test_watershed_binary_pallas_and_padded_match_generic():
    """Binary fast path through the Pallas kernels, including the +inf
    pad-and-crop route for unaligned shapes (pad bands are +inf, not 0/1 —
    the binary seed rule must still hold: inf pixels are not candidates)."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    import importlib
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    b_al = _boundary_map(n=128, seed=7)
    b_un = _boundary_map(n=150, seed=9)[:150, :137]
    want_al = np.asarray(WS.watershed(b_al, use_pallas=False))
    want_un = np.asarray(WS.watershed(b_un, use_pallas=False))
    FP.pl.pallas_call = interp_call
    try:
        got_al = np.asarray(WS.watershed.__wrapped__(b_al, use_pallas=True,
                                                     binary=True))
        got_un = np.asarray(WS.watershed.__wrapped__(b_un, use_pallas=True,
                                                     binary=True))
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(got_al, want_al)
    np.testing.assert_array_equal(got_un, want_un)


def test_watershed_batch_binary_matches_per_frame():
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    import importlib
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")
    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    batch = jnp.stack([_boundary_map(n=128, seed=s) for s in (2, 6)])
    want = np.stack([np.asarray(WS.watershed(batch[i], use_pallas=False))
                     for i in range(2)])
    FP.pl.pallas_call = interp_call
    try:
        got = np.asarray(WS.watershed_batch.__wrapped__(batch, use_pallas=True,
                                                        binary=True))
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(got, want)


def test_watershed_binary_with_markers_runs_real_flood():
    """User markers void the lam == img identity (an unmarked zero CC floods
    at level 1, not 0), so binary=True with markers must still Bellman-Ford —
    and agree with the generic markers path."""
    b = _boundary_map(seed=13)
    mk = regional_minima_labels(b, use_pallas=False)
    # keep only odd-numbered markers: some zero CCs are now unmarked
    mk = jnp.where(mk % 2 == 1, mk, 0)
    want = np.asarray(watershed(b, markers=mk, use_pallas=False))
    got = np.asarray(watershed(b, markers=mk, use_pallas=False, binary=True))
    np.testing.assert_array_equal(got, want)
    # unmarked zero CCs must have been flooded by a marked neighbor (no voids
    # beyond the watershed lines' 1-px web)
    assert (np.asarray(got) > 0).sum() > (np.asarray(mk) > 0).sum()


def test_binary_all_c_frame_matches_general():
    """A degenerate zero-free boundary map (all-c frame) is ONE regional
    minimum under the general semantics (a c-plateau with no lower neighbor);
    binary=True must seed it rather than settle the frame void."""
    allc = jnp.full((64, 128), 1.0, jnp.float32)
    want = np.asarray(watershed(allc, use_pallas=False))
    got = np.asarray(watershed(allc, use_pallas=False, binary=True))
    np.testing.assert_array_equal(got, want)
    assert got.max() == 1 and (got > 0).all()

    # mixed batch (XLA per-frame fallback): a normal boundary map + an all-c
    # frame; each frame must match its own general-path labels
    bnd = np.asarray(_boundary_map(n=64, seed=7))
    batch = jnp.asarray(np.stack([bnd, np.ones_like(bnd)]))
    got_b = np.asarray(watershed_batch(batch, use_pallas=False, binary=True))
    for i in range(2):
        np.testing.assert_array_equal(
            got_b[i], np.asarray(watershed(batch[i], use_pallas=False)))


def test_binary_all_c_frame_in_pallas_stack():
    """Same degenerate all-c frame through the STACKED Pallas batch path
    (interpret mode): the per-row-segment zero-presence logic must scope the
    'no zeros' test to each frame between the +inf separator bands — the
    normal frame keeps its zero-set seeds while the all-c frame becomes one
    plateau seed."""
    import importlib

    import tissue_image_processing_tpu.ops.flood_pallas as FP
    WS = importlib.import_module("tissue_image_processing_tpu.ops.watershed")

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    bnd = np.asarray(_boundary_map(n=64, seed=9))
    batch = jnp.asarray(np.stack([bnd, np.ones_like(bnd), bnd]))
    want = np.stack([np.asarray(WS.watershed(batch[i], use_pallas=False))
                     for i in range(3)])
    FP.pl.pallas_call = interp_call
    try:
        got = np.asarray(WS.watershed_batch.__wrapped__(batch, use_pallas=True,
                                                        binary=True))
    finally:
        FP.pl.pallas_call = orig_call
    np.testing.assert_array_equal(got, want)


def test_packed_settle_label_overflow_falls_back():
    """Labels past the packed word's 21-bit field (reachable: checkerboard
    minima are H*W/2 dense 4-CC ranks at 2048^2-class shapes) must route to
    the unpacked settle at runtime, not silently corrupt the stamp bits."""
    import tissue_image_processing_tpu.ops.flood_pallas as FP
    from tissue_image_processing_tpu.ops.watershed import regional_minima_labels

    orig_call = FP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    img = make_cell_image(128, 128, n_seeds=12, seed=5)
    seg = np.where(img < 0.2 * img.max(), 0, img)
    b = jnp.asarray(ndi.gaussian_filter(seg.astype(np.float32), 3.0))
    FP.pl.pallas_call = interp_call
    try:
        seeds = regional_minima_labels(b, use_pallas=True)
        lam = FP.bf_flood_pallas.__wrapped__(b, seeds)
        # shift every positive label past 2^21: enc = lbl + 2 no longer fits
        # the packed word's low bits, so the runtime guard must take over
        big = jnp.where(seeds > 0, seeds + (1 << 21), 0)
        l_ref, t_ref = FP.settle_pallas.__wrapped__(lam, big,
                                                    dense_labels=False)
        l_got, t_got = FP.settle_pallas.__wrapped__(lam, big,
                                                    dense_labels=True)
        np.testing.assert_array_equal(np.asarray(l_got), np.asarray(l_ref))
        np.testing.assert_array_equal(np.asarray(t_got), np.asarray(t_ref))
        assert int(np.asarray(l_got).max()) > (1 << 21)  # big labels survived
        # and the guard must NOT fire for in-range dense labels (packed path)
        l_s, t_s = FP.settle_pallas.__wrapped__(lam, seeds, dense_labels=True)
        l_u, t_u = FP.settle_pallas.__wrapped__(lam, seeds, dense_labels=False)
        np.testing.assert_array_equal(np.asarray(l_s), np.asarray(l_u))
        np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_u))
    finally:
        FP.pl.pallas_call = orig_call
