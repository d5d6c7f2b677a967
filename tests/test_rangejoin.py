"""range_join: parity with the brute-force inequality join + edge cases."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.rangejoin import range_join


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [(i, "k%d" % (i % 3), float(i * 7 % 100)) for i in range(60)],
        "pid long, k string, x double",
    )
    intervals = spark.createDataFrame(
        [
            (j, "k%d" % (j % 3), float(j * 11 % 90), float(j * 11 % 90 + 15))
            for j in range(25)
        ],
        "iid long, k string, lo double, hi double",
    )
    return points, intervals


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.select("pid", "iid").collect())


def test_range_join_matches_bruteforce(spark, frames):
    points, intervals = frames
    got = range_join(points, intervals, "x", "lo", "hi", by="k", bucket_width=10.0)
    expected = points.join(intervals, "k").filter(
        (F.col("lo") <= F.col("x")) & (F.col("x") <= F.col("hi"))
    )
    assert _pairs(got) == _pairs(expected) and len(_pairs(got)) > 0


def test_range_join_bucket_width_invariance(spark, frames):
    points, intervals = frames
    a = range_join(points, intervals, "x", "lo", "hi", by="k", bucket_width=3.0)
    b = range_join(points, intervals, "x", "lo", "hi", by="k", bucket_width=500.0)
    assert _pairs(a) == _pairs(b)


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [(0, 5.0), (1, 50.0), (2, 999.0)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 45.0, 55.0)], "iid long, lo double, hi double"
    )
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=10.0, how="left")
    rows = {r["pid"]: r for r in out.collect()}
    assert rows[0]["iid"] == 10 and rows[1]["iid"] == 11
    assert rows[2]["iid"] is None and rows[2]["lo"] is None
    assert out.count() == 3


def test_range_join_boundaries_inclusive_and_validation(spark):
    points = spark.createDataFrame([(0, 10.0), (1, 20.0)], "pid long, x double")
    intervals = spark.createDataFrame([(5, 10.0, 20.0)], "iid long, lo double, hi double")
    got = _pairs(range_join(points, intervals, "x", "lo", "hi", bucket_width=7.0))
    assert got == [(0, 5), (1, 5)]  # both endpoints inclusive
    with pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi", how="full")


def test_range_join_timestamp_axis(spark):
    from datetime import datetime

    pts = spark.createDataFrame(
        [(0, datetime(2024, 1, 1, 1, 30))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(9, datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 1, 2, 0))],
        "iid long, t0 timestamp, t1 timestamp",
    )
    got = range_join(pts, ivs, "ts", "t0", "t1", bucket_width=600.0)
    assert _pairs(got) == [(0, 9)]
