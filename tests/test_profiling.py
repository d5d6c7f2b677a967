"""Profiling operator tests (operators/profiling.py, round 6)."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.profiling import (
    equi_width_histogram,
    profile_columns,
)


def test_histogram_hand_case(spark):
    df = spark.createDataFrame([(float(x),) for x in [0, 1, 2, 3, 4, 4, 10]], "v double")
    rows = {r["bin"]: (r["lo"], r["hi"], r["n"])
            for r in equi_width_histogram(df, "v", bins=5).collect()}
    # range [0,10], width 2: bins [0,2):3 incl 0,1 ... value 10 lands in last bin
    assert rows[0] == (0.0, 2.0, 2)
    assert rows[1] == (2.0, 4.0, 2)
    assert rows[2] == (4.0, 6.0, 2)
    assert rows[3] == (6.0, 8.0, 0)   # zero bin kept
    assert rows[4] == (8.0, 10.0, 1)  # hi-edge value in last bin
    assert sum(n for _, _, n in rows.values()) == 7
    with pytest.raises(ValueError):
        equi_width_histogram(df, "v", bins=0)


def test_profile_columns_hand_case(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (None, "a"), (4.0, None)], "x double, s string"
    )
    prof = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    px, ps = prof["x"], prof["s"]
    assert (px["n"], px["nulls"], px["null_frac"], px["n_distinct"]) == (4, 1, 0.25, 3)
    assert (px["min_s"], px["max_s"], px["mean"]) == ("1.0", "4.0", round(7.0 / 3, 6))
    assert (ps["nulls"], ps["n_distinct"], ps["min_s"], ps["max_s"]) == (1, 2, "a", "b")
    assert ps["mean"] is None
    with pytest.raises(ValueError):
        profile_columns(df, [])


def test_histogram_quantiles_error_bound_and_merge(spark):
    """The estimate's bin must bracket the TRUE quantile (error <= bin
    width) for every q, and the underlying per-bin counts merge by SUM:
    the histogram of a union equals the summed histograms of its parts —
    the property that makes the estimator a one-pass mergeable sketch."""
    import numpy as np

    from oaxaca_blinder_rs_spark.operators.profiling import (
        equi_width_histogram,
        histogram_quantiles,
    )

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(100, 15, 4000), rng.exponential(40, 2000)])
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(7)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = {r.q: r for r in histogram_quantiles(df, "x", qs, bins=64).collect()}
    assert sorted(out) == qs
    for q in qs:
        # floor-index true quantile, the package's A8 convention
        s = np.sort(vals)
        true = s[min(int(len(s) * q), len(s) - 1)]
        r = out[q]
        assert r.bin_lo - 1e-9 <= true <= r.bin_hi + 1e-9, (q, true, r)
        assert r.bin_lo <= r.est <= r.bin_hi + 1e-9
    # merge-by-sum: histogram(union) == histogram(part1) + histogram(part2)
    lo, hi = float(vals.min()), float(vals.max())
    d1 = spark.createDataFrame([(float(v),) for v in vals[:3000]], "x double")
    d2 = spark.createDataFrame([(float(v),) for v in vals[3000:]], "x double")
    h = {r.bin: r.n for r in equi_width_histogram(df, "x", 32, lo, hi).collect()}
    h1 = {r.bin: r.n for r in equi_width_histogram(d1, "x", 32, lo, hi).collect()}
    h2 = {r.bin: r.n for r in equi_width_histogram(d2, "x", 32, lo, hi).collect()}
    assert h == {b: h1[b] + h2[b] for b in h}
    with pytest.raises(ValueError):
        histogram_quantiles(df, "x", [0.0])
