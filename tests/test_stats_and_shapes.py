import numpy as np
import pandas as pd
import pytest

from tissue_image_processing_tpu.stats.compare import (
    TwoSampleCompare, TwoByTwoCompare, HierarchicalTwoSamplesCompare,
    two_way_anova, scheirer_ray_hare, dunn_test)
from tissue_image_processing_tpu.core import shape_fit as S


def test_two_sample_normal_picks_t(rng):
    a = rng.normal(0, 1, 100)
    b = rng.normal(1.0, 1, 100)
    r = TwoSampleCompare(a, b).result
    assert "t-test" in r["test"]
    assert r["p_value"] < 0.001 and r["significant"]


def test_two_sample_nonnormal_picks_mannwhitney(rng):
    a = rng.exponential(1.0, 200)
    b = rng.exponential(1.0, 200)
    r = TwoSampleCompare(a, b).result
    assert r["test"] == "Mann-Whitney U"
    assert r["p_value"] > 0.01


def test_two_way_anova_detects_main_effect(rng):
    vals, fa, fb = [], [], []
    for a in (0, 1):
        for b in (0, 1):
            v = rng.normal(2.0 * a, 1, 50)
            vals.append(v)
            fa += [a] * 50
            fb += [b] * 50
    table = two_way_anova(np.concatenate(vals), np.array(fa), np.array(fb))
    pa = table.query('factor == "A"').p_value.iloc[0]
    pb = table.query('factor == "B"').p_value.iloc[0]
    assert pa < 1e-6 and pb > 0.01


def test_scheirer_ray_hare_runs(rng):
    vals = rng.exponential(1, 80)
    a = np.repeat([0, 1], 40)
    b = np.tile(np.repeat([0, 1], 20), 2)
    out = scheirer_ray_hare(vals, a, b)
    assert set(out.factor) == {"A", "B", "A:B"}
    assert ((out.p_value >= 0) & (out.p_value <= 1)).all()


def test_dunn_test(rng):
    g1 = rng.normal(0, 1, 60)
    g2 = rng.normal(0, 1, 60)
    g3 = rng.normal(3, 1, 60)
    out = dunn_test([g1, g2, g3], ["a", "b", "c"])
    p_ab = out.query('group1 == "a" and group2 == "b"').p_value.iloc[0]
    p_ac = out.query('group1 == "a" and group2 == "c"').p_value.iloc[0]
    assert p_ab > 0.05 and p_ac < 0.001


def test_two_by_two_compare(rng):
    samples = {(a, b): rng.normal(a * 2.0, 1, 40) for a in (0, 1) for b in (0, 1)}
    r = TwoByTwoCompare(samples).result
    assert r["method"] in ("two-way ANOVA", "Scheirer-Ray-Hare")
    table = r["table"]
    assert table.query('factor == "A"').iloc[0, -1] < 0.001


def test_hierarchical_counts(rng):
    g1 = [rng.poisson(2.0, 50) for _ in range(4)]
    g2 = [rng.poisson(5.0, 50) for _ in range(4)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="counts").result
    assert r["p_value"] < 0.01
    # pooling Poisson(2) with Poisson(5) is overdispersed -> NB family chosen
    assert "binomial" in r["family"] or "poisson" in r["family"]


def test_hierarchical_continuous(rng):
    g1 = [rng.normal(0, 1, 50) for _ in range(5)]
    g2 = [rng.normal(2, 1, 50) for _ in range(5)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="continuous").result
    assert r["p_value"] < 0.01


def test_fit_line():
    x = np.linspace(0, 10, 30)
    y = 2.0 * x + 1.0 + np.random.default_rng(0).normal(0, 0.01, 30)
    res, curve = S.fit_a_line(x, y)
    assert abs(res["slope"][0] - 2.0) < 0.01
    assert abs(res["y cross"][0] - 1.0) < 0.05
    assert res["slope"][1] < 0.01


def test_fit_circle():
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    x = 5 + 3 * np.cos(t)
    y = -2 + 3 * np.sin(t)
    res, curve = S.fit_a_circle(x, y)
    assert abs(res["radius"][0] - 3.0) < 1e-3
    assert abs(res["x_center"][0] - 5.0) < 1e-3
    assert abs(res["y_center"][0] + 2.0) < 1e-3


def test_fit_circle_arc():
    t = np.linspace(0.3, 1.5, 25)
    x = 10 + 8 * np.cos(t)
    y = 4 + 8 * np.sin(t)
    res, curve = S.fit_a_circle_arc(x, y)
    assert abs(res["curvature"][0] - 1 / 8.0) < 1e-3


def test_fit_ellipse():
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    a, b, phi = 6.0, 3.0, 0.5
    x = a * np.cos(t) * np.cos(phi) - b * np.sin(t) * np.sin(phi) + 20
    y = a * np.cos(t) * np.sin(phi) + b * np.sin(t) * np.cos(phi) + 10
    res, curve = S.fit_an_ellipse(x, y)
    assert abs(res["semi-major"][0] - a) < 0.05
    assert abs(res["semi-minor"][0] - b) < 0.05
    assert abs(res["center x"][0] - 20) < 0.1
    assert abs(res["center y"][0] - 10) < 0.1


def test_fit_spline():
    x = np.linspace(0, 20, 40)
    y = np.sin(x / 3.0) * 5
    res, curve = S.fit_a_spline(x, y)
    assert res["N"][0] == 40
    assert curve.shape[1] == 2


def test_fit_shape_dispatch():
    pts = [(0, 0), (1, 2), (2, 4), (3, 6), (4, 8)]
    res, curve = S.fit_shape("line", pts)
    assert abs(res["slope"][0] - 2.0) < 1e-6


def test_data_collector(tmp_path, rng):
    import os
    for grp, mean in [("expA", 0.0), ("expB", 3.0)]:
        d = os.path.join(tmp_path, grp)
        os.makedirs(d)
        for i in range(2):
            pd.DataFrame({"area": rng.normal(mean, 1, 30)}).to_pickle(
                os.path.join(d, f"area_division_data_{i}"))
    from tissue_image_processing_tpu.stats.collect import DataCollector
    dc = DataCollector([os.path.join(tmp_path, "expA"), os.path.join(tmp_path, "expB")],
                       "area_*", "area")
    stats_df = dc.group_stats()
    assert len(stats_df) == 2
    assert stats_df.n.tolist() == [60, 60]
    assert abs(stats_df.iloc[1]["mean"] - 3.0) < 0.5


def test_compare_and_plot(tmp_path, rng):
    import matplotlib
    matplotlib.use("Agg")
    from tissue_image_processing_tpu.stats.plots import compare_and_plot_samples
    ax, results = compare_and_plot_samples(
        {"a": rng.normal(0, 1, 50), "b": rng.normal(2, 1, 50)}, kind="violin")
    assert ("a", "b") in results
    assert results[("a", "b")]["p_value"] < 0.001


def test_glm_poisson_recovers_rate_ratio(rng):
    # Wald coefficient of a Poisson GLM with log link = log rate ratio
    from tissue_image_processing_tpu.stats.glm import fit_glm
    y = np.concatenate([rng.poisson(2.0, 400), rng.poisson(6.0, 400)])
    X = np.column_stack([np.ones(800), np.r_[np.zeros(400), np.ones(400)]])
    res = fit_glm(y, X, "poisson")
    assert res.converged
    assert abs(np.exp(res.coef[1]) - 3.0) < 0.4
    assert res.p_stage < 1e-6
    # equidispersed data: Pearson chi2/df near 1
    assert 0.7 < res.overdispersion < 1.3


def test_hierarchical_routing_poisson(rng):
    g1 = [rng.poisson(3.0, 60) for _ in range(4)]
    g2 = [rng.poisson(3.2, 60) for _ in range(4)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="counts").result
    assert r["family"] == "poisson"
    assert r["overdispersion"] < 1.5 and not r["zero_inflation"]


def test_hierarchical_routing_negbin(rng):
    # gamma-mixed Poisson, shifted off zero -> overdispersed with NO zeros
    # (the reference's zero check compares against the Poisson expectation, so
    # any overdispersed data WITH zeros routes zero-inflated; parity kept)
    def nb(n):
        lam = rng.gamma(2.0, 3.0, n)
        return rng.poisson(lam) + 1
    g1 = [nb(80) for _ in range(4)]
    g2 = [nb(80) + 2 for _ in range(4)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="counts").result
    assert r["family"] == "negative binomial"
    assert r["overdispersion"] > 1.5


def test_hierarchical_routing_zip(rng):
    # Poisson(4) with 50% structural zeros: zero-inflated, but the non-zero
    # part equidispersed enough to stay Poisson-family
    def zip_draw(n):
        y = rng.poisson(4.0, n)
        y[rng.random(n) < 0.5] = 0
        return y
    g1 = [zip_draw(100) for _ in range(3)]
    g2 = [zip_draw(100) for _ in range(3)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="counts").result
    assert r["zero_inflation"]
    assert "zero-inflated" in r["family"]
    assert r["p_value"] > 0.01  # same distribution: no stage effect


def test_hierarchical_routing_lmm_and_log(rng):
    g1 = [rng.normal(10, 1, 60) for _ in range(4)]
    g2 = [rng.normal(12, 1, 60) for _ in range(4)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="continuous").result
    assert r["family"] == "LMM (normal)"
    assert r["p_value"] < 1e-4
    # lognormal positive data routes to log-LMM
    g1 = [np.exp(rng.normal(0, 1.1, 60)) for _ in range(4)]
    g2 = [np.exp(rng.normal(0.8, 1.1, 60)) for _ in range(4)]
    r = HierarchicalTwoSamplesCompare(g1, g2, kind="continuous").result
    assert r["family"] == "log-LMM"
    assert r["p_value"] < 1e-3


def test_lmm_random_intercept_widens_se(rng):
    # strong per-replicate offsets: LMM must attribute them to the random
    # intercept; a naive pooled test would be wildly overconfident
    from tissue_image_processing_tpu.stats.glm import fit_lmm
    offs = rng.normal(0, 3.0, 6)
    y, stage, rep = [], [], []
    for i, o in enumerate(offs):
        vals = rng.normal(o, 1.0, 40)
        y.append(vals); stage.append(np.full(40, i % 2)); rep.append(np.full(40, i))
    y, stage, rep = map(np.concatenate, (y, stage, rep))
    X = np.column_stack([np.ones_like(y), stage])
    res = fit_lmm(y, X, rep)
    assert res.extra["var_ratio"] > 1.0   # sigma_u^2 >> sigma_e^2 detected
    naive_se = np.sqrt(8 / len(y))
    assert res.bse[1] > 3 * naive_se
