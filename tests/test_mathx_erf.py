"""Codegen-native erf (mathx.erf_expr) vs Python math.erf (libm).

The reference computes probit/IMR terms through statrs' Normal::cdf, which is
erf-based double-precision (reference math/probit.rs:41-81). Our Catalyst
implementation (Cody's CALERF) must agree with libm erf to ~1e-15 so the
1e-4-tolerance statsmodels anchors in test_numpy_oracle.py stay meaningful.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.functions.mathx import erf_expr, norm_cdf


GRID = (
    # region boundaries and sign symmetry
    [0.0, 1e-300, 1e-12, 0.46875, 0.468751, 4.0, 4.000001, 6.0, 10.0, 27.0, 40.0]
    + [i / 16.0 for i in range(1, 100)]          # dense through regions 1-2
    + [-i / 7.0 for i in range(1, 60)]           # negative side
    + [0.1 * i + 0.0123456789 for i in range(60)]  # off-lattice points
)


@pytest.fixture(scope="module")
def erf_rows(spark):
    df = spark.createDataFrame([(float(x),) for x in GRID], "x double")
    rows = df.select("x", erf_expr(F.col("x")).alias("e"),
                     norm_cdf(F.col("x")).alias("phi")).collect()
    return rows


def test_erf_matches_libm(erf_rows):
    worst = 0.0
    for r in erf_rows:
        err = abs(r["e"] - math.erf(r["x"]))
        worst = max(worst, err)
    assert worst < 1e-15, f"max |erf_expr - math.erf| = {worst}"


def test_norm_cdf_matches_libm(erf_rows):
    worst = 0.0
    for r in erf_rows:
        err = abs(r["phi"] - 0.5 * (1.0 + math.erf(r["x"] / math.sqrt(2.0))))
        worst = max(worst, err)
    assert worst < 1e-15, f"max |norm_cdf - libm| = {worst}"


def test_erf_np_matches_libm():
    import numpy as np

    from oaxaca_blinder_rs_spark.functions.mathx import erf_np, norm_cdf_np

    xs = np.array(GRID, dtype=np.float64)
    got = erf_np(xs)
    want = np.array([math.erf(v) for v in GRID])
    assert np.max(np.abs(got - want)) < 1e-15
    phi = norm_cdf_np(xs)
    want_phi = np.array([0.5 * (1 + math.erf(v / math.sqrt(2))) for v in GRID])
    assert np.max(np.abs(phi - want_phi)) < 1e-15


def test_erf_nan_inf_edges(spark):
    """NaN propagates, +-inf clamps to +-1 (CALERF XBIG cap) in both variants.

    Regression for two round-2 advisories: erf_np's region masks all excluded
    NaN, returning uninitialized memory; and the far region computed
    (inf-inf) = NaN for infinite inputs instead of the +-1 the replaced
    commons-math Erf.erf returned.
    """
    import numpy as np

    from oaxaca_blinder_rs_spark.functions.mathx import erf_np

    got = erf_np(np.array([np.nan, np.inf, -np.inf, 26.544, -26.544, 1e308]))
    assert math.isnan(got[0])
    assert got[1] == 1.0 and got[2] == -1.0
    assert got[3] == 1.0 and got[4] == -1.0 and got[5] == 1.0

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (float("-inf"),), (26.544,), (-26.544,)],
        "x double",
    )
    es = [r["e"] for r in df.select(erf_expr(F.col("x")).alias("e")).collect()]
    assert math.isnan(es[0])
    assert es[1] == 1.0 and es[2] == -1.0
    assert es[3] == 1.0 and es[4] == -1.0


def test_erf_interpreted_path(spark):
    """Pin the non-codegen (interpreted) evaluation path: with whole-stage
    codegen disabled, erf_expr must produce the identical bits, including
    inside an aggregate. Cheap insurance for the one hand-rolled numeric
    kernel every GLM depends on."""
    old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        df = spark.createDataFrame([(float(x),) for x in GRID], "x double")
        rows = df.select("x", erf_expr(F.col("x")).alias("e")).collect()
        for r in rows:
            assert abs(r["e"] - math.erf(r["x"])) < 1e-15
        got = df.agg(F.sum(erf_expr(F.col("x"))).alias("s")).collect()[0]["s"]
        want = sum(math.erf(x) for x in GRID)
        assert abs(got - want) < 1e-10
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", old)


def test_erf_inside_aggregate(spark):
    """Determinism: unlike the old java_method erf, erf_expr is legal inside
    an aggregate function (no extra projection step required)."""
    df = spark.createDataFrame([(float(i) / 10.0,) for i in range(-30, 31)], "x double")
    got = df.agg(F.sum(erf_expr(F.col("x"))).alias("s")).collect()[0]["s"]
    want = sum(math.erf(i / 10.0) for i in range(-30, 31))
    assert abs(got - want) < 1e-12
