"""SCD Type-2 build + incremental apply (operators/cdc.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.cdc import scd2_apply, scd2_build


def _t(i):
    return datetime(2024, 1, i)


def test_scd2_build_hand_case(spark):
    """x,x,y,y,x collapses to three intervals; valid_to chains to the next
    change; only the last row is current."""
    feed = spark.createDataFrame(
        [(1, _t(d), a) for d, a in [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "x")]],
        "k long, ts timestamp, attr string",
    )
    rows = (
        scd2_build(feed, "k", ["attr"], "ts")
        .orderBy("valid_from")
        .collect()
    )
    got = [(r["attr"], r["valid_from"], r["valid_to"], r["is_current"]) for r in rows]
    assert got == [
        ("x", _t(1), _t(3), False),
        ("y", _t(3), _t(5), False),
        ("x", _t(5), None, True),
    ]


def test_scd2_build_null_safe_attrs_and_multi_attr(spark):
    """null -> null is NOT a change; any single attribute changing opens a
    new interval."""
    feed = spark.createDataFrame(
        [
            (1, _t(1), None, 10.0),
            (1, _t(2), None, 10.0),  # no change
            (1, _t(3), None, 11.0),  # second attr changes
            (1, _t(4), "a", 11.0),  # first attr null -> 'a'
        ],
        "k long, ts timestamp, a string, b double",
    )
    rows = scd2_build(feed, "k", ["a", "b"], "ts").orderBy("valid_from").collect()
    assert [(r["a"], r["b"]) for r in rows] == [(None, 10.0), (None, 11.0), ("a", 11.0)]
    assert [r["is_current"] for r in rows] == [False, False, True]


def test_scd2_build_validates_columns(spark):
    feed = spark.createDataFrame([(1, _t(1), "x")], "k long, ts timestamp, a string")
    with pytest.raises(ValueError):
        scd2_build(feed, "k", ["nope"], "ts")


def test_scd2_apply_equals_full_build_on_events(spark, sf_dir):
    """Incremental invariant on real data: build(first half) then
    apply(second half) is row-identical to build(everything)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # split by event id, NOT time: the second batch interleaves in time with
    # the first, so the apply path must handle genuinely late arrivals
    cut = ev.select(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    early = ev.filter(F.col("event_id") <= cut)
    # restrict the late batch to a user subset so the untouched-keys
    # left-anti path is genuinely exercised
    late = ev.filter((F.col("event_id") > cut) & (F.col("user_id") % 7 == 0))
    dim = scd2_build(early, "user_id", ["event_type"], "ts", ["event_id"])
    merged = scd2_apply(dim, late, "user_id", ["event_type"], "ts", ["event_id"])
    full = scd2_build(
        early.unionByName(late), "user_id", ["event_type"], "ts", ["event_id"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    untouched = dim.join(late.select("user_id").distinct(), "user_id", "left_anti")
    assert untouched.count() > 0


def test_scd2_apply_late_arrival_splits_interval(spark):
    """A change that lands INSIDE an existing interval splits it; a no-op
    change (same attr as the covering interval) collapses away."""
    feed = spark.createDataFrame(
        [(1, _t(1), "x"), (1, _t(9), "y")], "k long, ts timestamp, attr string"
    )
    dim = scd2_build(feed, "k", ["attr"], "ts")
    late = spark.createDataFrame(
        [(1, _t(5), "z"), (1, _t(7), "x")], "k long, ts timestamp, attr string"
    )
    rows = (
        scd2_apply(dim, late, "k", ["attr"], "ts").orderBy("valid_from").collect()
    )
    got = [(r["attr"], r["valid_from"], r["valid_to"]) for r in rows]
    assert got == [
        ("x", _t(1), _t(5)),
        ("z", _t(5), _t(7)),
        ("x", _t(7), _t(9)),
        ("y", _t(9), None),
    ]
    noop = spark.createDataFrame([(1, _t(3), "x")], "k long, ts timestamp, attr string")
    again = scd2_apply(dim, noop, "k", ["attr"], "ts")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, dim.collect()))
