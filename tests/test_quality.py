"""Constraint checking (operators/quality.py)."""

import pytest

from oaxaca_blinder_rs_spark.operators.quality import check_constraints


def test_check_constraints_hand_case(spark):
    """Every rule type against a frame with known violations, including the
    strict null semantics: null fails range/in_set/predicate too."""
    df = spark.createDataFrame(
        [
            (1, "a", 5.0, 10),
            (2, "b", 50.0, 20),
            (2, "c", None, 30),   # dup id; null value
            (None, "d", -1.0, 99),  # null id; below range; orphan ref
        ],
        "id long, name string, value double, fk long",
    )
    ref = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    rules = [
        {"type": "not_null", "col": "id"},
        {"type": "range", "col": "value", "lo": 0.0, "hi": 100.0},
        {"type": "in_set", "col": "name", "values": ["a", "b", "c"]},
        {"type": "predicate", "expr": "value > 0"},
        {"type": "unique", "cols": ["id"]},
        {"type": "foreign_key", "col": "fk", "ref": ref, "ref_col": "k"},
    ]
    got = {r.constraint: r for r in check_constraints(df, rules).collect()}
    assert got["not_null"].violations == 1
    assert got["range"].violations == 2          # null + (-1.0)
    assert got["in_set"].violations == 1         # "d"
    assert got["predicate"].violations == 2      # null + (-1.0)
    assert got["unique"].violations == 2         # both rows of the dup key
    assert got["foreign_key"].violations == 1    # fk=99
    assert all(r.n == 4 for r in got.values())
    assert not any(r.ok for r in got.values())
    clean = check_constraints(ref, [{"type": "unique", "cols": ["k"]}]).collect()[0]
    assert clean.ok and clean.violations == 0


def test_check_constraints_validates(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        check_constraints(df, [])
    with pytest.raises(ValueError):
        check_constraints(df, [{"type": "nope"}])


def test_table_level_rules(spark):
    """min_rows and freshness: table-level rules with a caller-pinned as_of
    (deterministic — no wall clock). n reports the measured quantity: row
    count / hours of staleness."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 0, 0)), (2, datetime(2026, 1, 2, 12, 0, 0))],
        "id long, ts timestamp",
    )
    rules = [
        {"type": "min_rows", "n": 2},
        {"type": "min_rows", "n": 3},
        {"type": "freshness", "col": "ts", "max_age_hours": 24,
         "as_of": "2026-01-03T00:00:00"},
        {"type": "freshness", "col": "ts", "max_age_hours": 6,
         "as_of": "2026-01-03T00:00:00"},
    ]
    rows = check_constraints(df, rules).collect()
    by_detail = {r.detail: r for r in rows}
    assert by_detail["n >= 2"].ok and by_detail["n >= 2"].violations == 0
    assert not by_detail["n >= 3"].ok and by_detail["n >= 3"].violations == 1
    fresh_ok = by_detail["max(ts) >= 2026-01-03T00:00:00 - 24h"]
    assert fresh_ok.ok and fresh_ok.n == 12  # 12h stale, within 24
    fresh_bad = by_detail["max(ts) >= 2026-01-03T00:00:00 - 6h"]
    assert not fresh_bad.ok and fresh_bad.violations == 1
    # empty table: freshness fails with staleness unknown (n = 0)
    empty = spark.createDataFrame([], "id long, ts timestamp")
    r = check_constraints(
        empty,
        [{"type": "freshness", "col": "ts", "max_age_hours": 1,
          "as_of": "2026-01-03T00:00:00"}],
    ).collect()[0]
    assert not r.ok and r.n == 0


def test_freshness_accepts_timezone_aware_as_of(spark):
    """An as_of carrying a UTC offset must not TypeError against the naive
    datetime Spark returns for MAX(timestamp) (r7 advisory): aware as_of is
    normalized to naive UTC, so '+00:00' gives the same verdicts as naive,
    and a '+06:00' as_of is evaluated at its UTC instant."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2026, 1, 2, 12, 0, 0))], "id long, ts timestamp"
    )
    r = check_constraints(
        df,
        [{"type": "freshness", "col": "ts", "max_age_hours": 24,
          "as_of": "2026-01-03T00:00:00+00:00"}],
    ).collect()[0]
    assert r.ok and r.n == 12
    # 2026-01-03T06:00+06:00 IS 2026-01-03T00:00 UTC: same 12h staleness
    r6 = check_constraints(
        df,
        [{"type": "freshness", "col": "ts", "max_age_hours": 6,
          "as_of": "2026-01-03T06:00:00+06:00"}],
    ).collect()[0]
    assert not r6.ok and r6.n == 12
