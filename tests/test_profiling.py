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
