"""Statistical sanity checks: the bootstrap machinery should reproduce
textbook sampling distributions, not just run."""

import math

import numpy as np

from oaxaca_blinder_rs_spark import OaxacaBuilder


def test_bootstrap_se_matches_analytic(spark):
    """With intercept-only models the decomposition total gap is a difference
    of group means; its bootstrap SE must approximate
    sqrt(var_a/n_a + var_b/n_b)."""
    rng = np.random.default_rng(3)
    n = 2000
    g = np.where(rng.random(n) < 0.5, "A", "B")
    y = np.where(g == "A", 10.0, 7.0) + rng.normal(0, 2.0, n)
    x = rng.normal(0, 1, n)  # predictor uncorrelated with y
    df = spark.createDataFrame(
        [(float(a), float(b), str(c)) for a, b, c in zip(y, x, g)], ["y", "x", "g"]
    )
    res = (
        OaxacaBuilder(df, "y", "g", "B")
        .predictors(["x"])
        .bootstrap_reps(200)
        .bootstrap_method("poisson")
        .seed(5)
        .run()
    )
    ya, yb = y[g == "A"], y[g == "B"]
    analytic = math.sqrt(ya.var(ddof=1) / len(ya) + yb.var(ddof=1) / len(yb))
    # total-gap SE materializes through explained+unexplained; use the sum's
    # components: check the aggregate two-fold SEs are in a sane band around
    # the analytic gap SE (they partition the gap, so each is <= ~gap SE scale)
    est_gap = res.total_gap
    assert abs(est_gap - (ya.mean() - yb.mean())) < 1e-9
    boot_se = math.sqrt(
        res.two_fold.explained.std_err ** 2 + res.two_fold.unexplained.std_err ** 2
    )
    # explained/unexplained are nearly independent here (x is noise), so the
    # rss of their SEs approximates the gap SE within bootstrap noise
    assert 0.5 * analytic < boot_se < 2.0 * analytic


def test_bootstrap_exact_and_poisson_agree_statistically(spark):
    """Exact-n and Poisson bootstraps estimate the same SE (within MC noise)."""
    rng = np.random.default_rng(11)
    n = 500
    g = np.where(rng.random(n) < 0.5, "A", "B")
    y = np.where(g == "A", 5.0, 3.0) + rng.normal(0, 1.0, n)
    x = 0.5 * y + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        [(float(a), float(b), str(c)) for a, b, c in zip(y, x, g)], ["y", "x", "g"]
    )

    def se(method):
        res = (
            OaxacaBuilder(df, "y", "g", "B")
            .predictors(["x"])
            .bootstrap_reps(150)
            .bootstrap_method(method)
            .seed(7)
            .run()
        )
        return res.two_fold.explained.std_err

    se_exact, se_poisson = se("exact"), se("poisson")
    assert 0.6 < se_exact / se_poisson < 1.6


def test_rare_category_bootstrap_finite(spark):
    """integration_test.rs:55-104 spirit (the reference #[ignore]s its
    version because a one-group-only category makes the other group's design
    singular — we reproduce that failure mode faithfully). With a category
    RARE IN BOTH groups, some bootstrap resamples lose it (singular -> rep
    dropped with a warning) but the final CIs stay finite."""
    wage = [10.0, 12.0, 11.0, 13.0, 15.0, 20.0, 22.0, 21.0, 23.0, 25.0] * 2
    edu = [12.0, 16.0, 14.0, 16.0, 18.0] * 4
    gender = ["F"] * 10 + ["M"] * 10
    sector = ["A"] * 9 + ["B"] + ["A"] * 9 + ["B"]  # "B" rare in each group
    df = spark.createDataFrame(list(zip(wage, edu, gender, sector)),
                               ["wage", "education", "gender", "sector"])
    res = (
        OaxacaBuilder(df, "wage", "gender", "F")
        .predictors(["education"])
        .categorical_predictors(["sector"])
        .bootstrap_reps(15)
        .seed(2)
        .run()
    )
    unexp = {c.name: c for c in res.two_fold.detailed_unexplained}
    assert "sector_B" in unexp
    for name in ("intercept", "education", "sector_B"):
        c = unexp[name]
        assert math.isfinite(c.ci_lower) and math.isfinite(c.ci_upper)


def test_one_group_only_category_is_singular(spark):
    """A category present in only one group zeroes the other group's dummy
    column -> SingularMatrix, exactly like the reference's Cholesky failure
    (why integration_test.rs:55-104 is #[ignore]d there)."""
    import pytest

    from oaxaca_blinder_rs_spark import SingularMatrix

    wage = [10.0, 12.0, 11.0, 13.0, 15.0, 20.0, 22.0, 21.0, 23.0, 25.0] * 2
    edu = [12.0, 16.0, 14.0, 16.0, 18.0] * 4
    gender = ["F"] * 10 + ["M"] * 10
    sector = ["A"] * 9 + ["B"] + ["A"] * 10
    df = spark.createDataFrame(list(zip(wage, edu, gender, sector)),
                               ["wage", "education", "gender", "sector"])
    with pytest.raises(SingularMatrix):
        (
            OaxacaBuilder(df, "wage", "gender", "F")
            .predictors(["education"])
            .categorical_predictors(["sector"])
            .bootstrap_reps(0)
            .run()
        )
