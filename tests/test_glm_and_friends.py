"""GLM kernels, Heckman, DFL, JMP, VIF — mirroring the reference's unit and
integration fixtures (math/logit.rs tests, math/diagnostics.rs tests,
tests/features_test.rs, tests/heckman_test.rs)."""

import math

import numpy as np
import pytest

from oaxaca_blinder_rs_spark import OaxacaBuilder, SingularMatrix, OaxacaError
from oaxaca_blinder_rs_spark.operators.dfl import run_dfl
from oaxaca_blinder_rs_spark.operators.diagnostics import calculate_vif
from oaxaca_blinder_rs_spark.operators.glm import logit, probit
from oaxaca_blinder_rs_spark.operators.jmp import decompose_changes

INTERCEPT = "__ob_intercept__"


def glm_df(spark):
    xs = [-5.0, -4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    from pyspark.sql import functions as F

    return spark.createDataFrame(list(zip(xs, ys)), ["x", "y"]).withColumn(
        INTERCEPT, F.lit(1.0)
    )


def test_logit_statsmodels_anchor(spark):
    """math/logit.rs:126-146: coefficients vs statsmodels to 1e-4."""
    fit = logit(glm_df(spark), [INTERCEPT, "x"], "y")
    assert abs(fit.beta[0] - 0.6533055) < 1e-4
    assert abs(fit.beta[1] - 1.3046124) < 1e-4
    assert fit.converged
    assert fit.iterations > 0


def test_fit_many_compress_cells_matches_distributed(spark):
    """The r14 compress_cells driver engine must reproduce the distributed
    loop: same beta (to float-sum tolerance), same convergence flag and
    iteration count, for logit and probit, keyless and keyed, weighted and
    not — including repeated rows collapsing to weighted cells."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.glm import fit_many

    xs = [-5.0, -4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    rows = [
        (x, y, g, float(w))
        for g in ("a", "b")
        for (x, y), w in zip(zip(xs, ys), [1, 2, 1, 3, 1, 1, 2, 1, 1, 1, 2])
    ]
    df = spark.createDataFrame(rows, ["x", "y", "g", "w"]).withColumn(
        INTERCEPT, F.lit(1.0)
    )
    # duplicate some rows so compression genuinely collapses cells
    df = df.unionByName(df.filter(F.col("x") > 2.0))
    for family in ("logit", "probit"):
        for key_cols in (None, ["g"]):
            for wcol in (None, "w"):
                a = fit_many(
                    df, [INTERCEPT, "x"], "y", family=family,
                    key_cols=key_cols, wcol=wcol, compress_cells=False,
                )
                b = fit_many(
                    df, [INTERCEPT, "x"], "y", family=family,
                    key_cols=key_cols, wcol=wcol, compress_cells=True,
                )
                assert set(a) == set(b)
                for key in a:
                    assert a[key].converged == b[key].converged
                    assert a[key].iterations == b[key].iterations
                    np.testing.assert_allclose(
                        a[key].beta, b[key].beta, rtol=1e-9, atol=1e-12
                    )


def test_fit_many_compress_cells_falls_back_over_limit(spark, monkeypatch):
    """Above GLM_CELL_COLLECT_LIMIT the compressed path must fall back to
    the distributed loop and still converge to the same answer."""
    import oaxaca_blinder_rs_spark.operators.glm as glm_mod

    monkeypatch.setattr(glm_mod, "GLM_CELL_COLLECT_LIMIT", 3)
    fit_c = glm_mod.fit_many(
        glm_df(spark), [INTERCEPT, "x"], "y", compress_cells=True
    )[()]
    fit_d = glm_mod.fit_many(
        glm_df(spark), [INTERCEPT, "x"], "y", compress_cells=False
    )[()]
    assert fit_c.converged and fit_c.iterations == fit_d.iterations
    np.testing.assert_allclose(fit_c.beta, fit_d.beta, rtol=1e-9)


def test_logit_max_iterations(spark):
    """logit.rs:190-203: with max_iter=1, not converged."""
    fit = logit(glm_df(spark), [INTERCEPT, "x"], "y", max_iter=1)
    assert not fit.converged
    assert fit.iterations == 1


def test_logit_singular(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0.0,), (1.0,), (0.0,), (1.0,)], ["y"]).withColumn(
        INTERCEPT, F.lit(1.0)
    ).withColumn("x2", F.lit(1.0))
    with pytest.raises(SingularMatrix, match="Information Matrix"):
        logit(df, [INTERCEPT, "x2"], "y")


def test_probit_sign_and_convergence(spark):
    """math/probit.rs:174-229: converges, positive slope on this data."""
    fit = probit(glm_df(spark), [INTERCEPT, "x"], "y")
    assert fit.converged
    assert fit.beta[1] > 0
    assert fit.vcov is not None and fit.vcov.shape == (2, 2)
    # vcov diagonal positive
    assert fit.vcov[0, 0] > 0 and fit.vcov[1, 1] > 0


def test_probit_vs_independent_mle(spark):
    """Cross-check probit against an independent driver-side NumPy Fisher-
    scoring MLE of the same fixture: beta = (0.3907706, 0.7815084)."""
    fit = probit(glm_df(spark), [INTERCEPT, "x"], "y")
    assert abs(fit.beta[0] - 0.3907706) < 1e-5
    assert abs(fit.beta[1] - 0.7815084) < 1e-5


def test_vif_reference_values(spark):
    """diagnostics.rs:116-142: manually verified VIF values."""
    rows = [(1.0, 2.0, 1.0), (2.0, 3.0, 5.0), (3.0, 1.0, 2.0), (4.0, 5.0, 4.0), (5.0, 4.0, 3.0)]
    df = spark.createDataFrame(rows, ["x1", "x2", "x3"])
    res = calculate_vif(df, ["x1", "x2", "x3"])
    assert abs(res[0].vif_score - 1.5763546798) < 1e-6
    assert abs(res[1].vif_score - 2.2413793103) < 1e-6
    assert abs(res[2].vif_score - 1.5763546798) < 1e-6


def test_vif_perfect_collinearity(spark):
    rows = [(1.0, 2.0, 1.0), (2.0, 4.0, 1.0), (3.0, 6.0, 2.0), (4.0, 8.0, 2.0), (5.0, 10.0, 3.0)]
    df = spark.createDataFrame(rows, ["x1", "x2", "x3"])
    res = calculate_vif(df, ["x1", "x2", "x3"])
    assert math.isinf(res[0].vif_score)


def test_vif_too_few(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], ["x1"])
    with pytest.raises(OaxacaError, match="at least two predictors"):
        calculate_vif(df, ["x1"])


def test_jmp_total_change(spark):
    """features_test.rs:38-71: total change == -5.0."""
    t1 = [
        (10.0, 12.0, "F"), (12.0, 16.0, "F"), (11.0, 14.0, "F"), (13.0, 16.0, "F"), (15.0, 18.0, "F"),
        (20.0, 12.0, "M"), (22.0, 16.0, "M"), (21.0, 14.0, "M"), (23.0, 16.0, "M"), (25.0, 18.0, "M"),
    ]
    t2 = [
        (15.0, 12.0, "F"), (17.0, 16.0, "F"), (16.0, 14.0, "F"), (18.0, 16.0, "F"), (20.0, 18.0, "F"),
        (20.0, 12.0, "M"), (22.0, 16.0, "M"), (21.0, 14.0, "M"), (23.0, 16.0, "M"), (25.0, 18.0, "M"),
    ]
    cols = ["wage", "education", "gender"]
    b1 = OaxacaBuilder(spark.createDataFrame(t1, cols), "wage", "gender", "F").predictors(["education"]).bootstrap_reps(0)
    b2 = OaxacaBuilder(spark.createDataFrame(t2, cols), "wage", "gender", "F").predictors(["education"]).bootstrap_reps(0)
    jmp = decompose_changes(b1, b2)
    jmp.summary()
    assert abs(jmp.total_change - (-5.0)) < 1e-4
    # identity: quantity + price = explained change; price+quantity+gap = total
    assert abs(jmp.quantity_effect + jmp.price_effect + jmp.gap_effect - jmp.total_change) < 1e-9


def test_kde_on_grid_many_matches_per_frame_calls(spark):
    """The r14 single-pass conditional-sum KDE must equal the per-frame
    kde_on_grid calls it replaces (run_dfl's a/b/counterfactual densities),
    including a weighted spec and distinct bandwidths."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.kde import kde_on_grid, kde_on_grid_many

    rows = [(float(i % 7) + 0.25 * i, float(i % 2), 0.5 + 0.1 * (i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, ["y", "grp", "w"])
    grid = [0.0, 3.0, 6.0, 9.0, 12.0]
    fa = df.filter(F.col("grp") == 1.0)
    fb = df.filter(F.col("grp") == 0.0)
    want_a = kde_on_grid(fa, "y", grid, 1.3)
    want_b = kde_on_grid(fb, "y", grid, 0.8)
    want_w = kde_on_grid(fb, "y", grid, 0.8, wcol="w")
    got = kde_on_grid_many(
        df,
        "y",
        grid,
        [
            ("a", F.col("grp") == 1.0, None, 1.3),
            ("b", F.col("grp") == 0.0, None, 0.8),
            ("wb", F.col("grp") == 0.0, F.col("w"), 0.8),
        ],
    )
    np.testing.assert_allclose(got["a"], want_a, rtol=1e-12)
    np.testing.assert_allclose(got["b"], want_b, rtol=1e-12)
    np.testing.assert_allclose(got["wb"], want_w, rtol=1e-12)


def test_dfl_output_lengths(spark):
    """features_test.rs: DFL output vectors length == 100; counterfactual
    density integrates to ~1."""
    rng = np.random.default_rng(42)
    n = 400
    g = np.where(rng.random(n) < 0.5, "A", "B")
    edu = np.where(g == "A", rng.normal(14, 2, n), rng.normal(12, 2, n))
    wage = 5 + 1.2 * edu + rng.normal(0, 1, n)
    rows = [(float(w), float(e), str(gg)) for w, e, gg in zip(wage, edu, g)]
    df = spark.createDataFrame(rows, ["wage", "education", "group"])
    res = run_dfl(df, "wage", "group", "B", ["education"])
    assert len(res.grid) == 100
    assert len(res.density_a) == 100
    assert len(res.density_b) == 100
    assert len(res.density_b_counterfactual) == 100
    step = res.grid[1] - res.grid[0]
    mass = sum(res.density_b_counterfactual) * step
    assert 0.8 < mass < 1.1
    # counterfactual should shift B's density toward A's
    mean_b = sum(g * d for g, d in zip(res.grid, res.density_b)) * step
    mean_cf = sum(g * d for g, d in zip(res.grid, res.density_b_counterfactual)) * step
    mean_a = sum(g * d for g, d in zip(res.grid, res.density_a)) * step
    assert mean_b < mean_cf <= mean_a + 1.0


def test_dfl_categorical_predictor(spark):
    """dfl.rs:80-103: string predictors auto-dummied (skip first level)."""
    rows = []
    rng = np.random.default_rng(1)
    for i in range(200):
        g = "A" if rng.random() < 0.5 else "B"
        sec = "tech" if (g == "A") == (rng.random() < 0.7) else "admin"
        w = 10 + (3 if sec == "tech" else 0) + rng.normal(0, 1)
        rows.append((float(w), sec, g))
    df = spark.createDataFrame(rows, ["wage", "sector", "group"])
    res = run_dfl(df, "wage", "group", "B", ["sector"])
    assert len(res.grid) == 100


def heckman_df(spark):
    """FIXTURES.md F3 generator (tests/heckman_test.rs:8-58), seed=42."""
    rng = np.random.default_rng(42)
    n = 2000
    rows = []
    for _ in range(n):
        z = rng.normal()
        x = z + 0.5 * rng.normal()
        u = rng.normal()
        e = 0.8 * u + math.sqrt(1 - 0.64) * rng.normal()
        s = 1.0 if 0.5 * z + u > 0 else 0.0
        y = 1.0 + 2.0 * x + e if s == 1.0 else None
        gr = "A" if rng.random() < 0.5 else "B"
        rows.append((y, float(x), float(z), s, gr))
    return spark.createDataFrame(rows, "outcome double, x double, z double, selection double, group string")


def test_heckman_imr_component(spark):
    """heckman_test.rs:60-74: IMR appears among detailed components."""
    df = heckman_df(spark)
    res = (
        OaxacaBuilder(df, "outcome", "group", "B")
        .predictors(["x"])
        .heckman_selection("selection", ["z"])
        .bootstrap_reps(0)
        .run()
    )
    names = [c.name for c in res.two_fold.detailed_explained]
    assert "IMR" in names
    res.summary()


def test_heckman_recovers_beta(spark):
    """Simulation check: outcome slope on x should be near 2.0 after
    correction (the naive OLS on selected rows is biased)."""
    df = heckman_df(spark)
    res = (
        OaxacaBuilder(df, "outcome", "group", "B")
        .predictors(["x"])
        .heckman_selection("selection", ["z"])
        .reference_coefficients("group_b")
        .bootstrap_reps(0)
        .run()
    )
    # beta_star = group B coefficients = [intercept, x, IMR]
    assert abs(res.beta_star[1] - 2.0) < 0.15


def test_heckman_bootstrap(spark):
    df = heckman_df(spark)
    res = (
        OaxacaBuilder(df, "outcome", "group", "B")
        .predictors(["x"])
        .heckman_selection("selection", ["z"])
        .bootstrap_reps(10)
        .run()
    )
    assert math.isfinite(res.two_fold.explained.std_err)
    assert len(res.two_fold.detailed_selection) == 2  # intercept + z


def test_heckman_pooled_rejected(spark):
    df = heckman_df(spark)
    with pytest.raises(OaxacaError, match="Pooled"):
        (
            OaxacaBuilder(df, "outcome", "group", "B")
            .predictors(["x"])
            .heckman_selection("selection", ["z"])
            .reference_coefficients("pooled")
            .bootstrap_reps(0)
            .run()
        )


def test_heckman_two_step_free_function(spark):
    """heckman.rs:38-108 standalone: slope on x recovered near 2.0 and the
    IMR coefficient is positive (rho = 0.8 > 0) on the F3 fixture."""
    from oaxaca_blinder_rs_spark.operators.heckman import heckman_two_step

    df = heckman_df(spark)
    res = heckman_two_step(df, "selection", ["z"], "outcome", ["x"])
    assert abs(res["outcome_coeffs"][1] - 2.0) < 0.15
    assert res["imr_coeff"] > 0
    assert res["selection_coeffs"][1] > 0.3  # gamma_z near 0.5/sqrt(2)
    assert res["imr_delta"] < 0


def test_order_stats_distributed_selection(spark):
    """order_stats (ungrouped) must return exact global order statistics via
    the range-partitioned selection path — including ties, duplicates at
    range boundaries, and indices at both extremes — matching a full sort."""
    from oaxaca_blinder_rs_spark.operators.kde import order_stats

    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(0.0, 10.0, 5000), 1)  # heavy ties
    df = spark.createDataFrame([(float(v),) for v in vals], "y double").repartition(16)
    ref = np.sort(vals)
    idxs = [0, 1, 1250, 2500, 3749, 4999]
    got = order_stats(df, "y", idxs)
    assert set(got) == set(idxs)
    for i in idxs:
        assert got[i] == pytest.approx(float(ref[i]), abs=1e-12)
    # out-of-range indices are silently omitted (legacy behavior)
    assert order_stats(df, "y", [10_000_000]) == {}
    # grouped path: exact per-group ranks through the same cell machinery
    gdf = spark.createDataFrame(
        [("A" if i % 3 else "B", float(v)) for i, v in enumerate(vals)], "g string, y double"
    ).repartition(16)
    arr_a = np.sort(vals[[i for i in range(len(vals)) if i % 3]])
    arr_b = np.sort(vals[[i for i in range(len(vals)) if not i % 3]])
    got_g = order_stats(gdf, "y", [0, 100, 1000], group="g")
    for i in (0, 100, 1000):
        assert got_g[("A", i)] == pytest.approx(float(arr_a[i]), abs=1e-12)
        assert got_g[("B", i)] == pytest.approx(float(arr_b[i]), abs=1e-12)
