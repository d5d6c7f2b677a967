"""Hand-computed fixtures for the time-series operators."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.timeseries import gap_fill_hourly, rolling_window


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_gap_fill_hourly_zero_fills_missing_cells(spark):
    t = datetime(2026, 1, 1)
    df = _ev(
        spark,
        [
            (0, 1, t.replace(hour=0, minute=5), "click", 1.0),
            (1, 1, t.replace(hour=0, minute=50), "click", 2.0),
            (2, 2, t.replace(hour=3, minute=10), "view", 5.0),
        ],
    )
    out = {(r["hour_start"], r["event_type"]): r for r in gap_fill_hourly(df).collect()}
    # span = hours 0..3, groups = {click, view} -> 8 dense cells
    assert len(out) == 8
    assert out[("2026-01-01 00:00:00", "click")]["n_events"] == 2
    assert out[("2026-01-01 00:00:00", "click")]["sum_value"] == 3.0
    assert out[("2026-01-01 01:00:00", "click")]["n_events"] == 0
    assert out[("2026-01-01 02:00:00", "view")]["sum_value"] == 0.0
    assert out[("2026-01-01 03:00:00", "view")]["n_events"] == 1


def test_rolling_window_trailing_hour(spark):
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    df = _ev(
        spark,
        [
            (0, 1, t0, "c", 1.0),
            (1, 1, t0.replace(minute=30), "c", 2.0),   # 0 and 1 in window
            (2, 1, t0.replace(hour=13, minute=1), "c", 4.0),  # 1 (61m after 0) and 2
            (3, 2, t0.replace(minute=30), "c", 8.0),   # other user: isolated
        ],
    )
    out = {r["event_id"]: r for r in rolling_window(df, 3600).collect()}
    assert out[0]["w_count"] == 1 and out[0]["w_sum"] == 1.0
    assert out[1]["w_count"] == 2 and out[1]["w_sum"] == 3.0
    assert out[2]["w_count"] == 2 and out[2]["w_sum"] == 6.0  # events 1 and 2
    assert out[3]["w_count"] == 1 and out[3]["w_sum"] == 8.0
    with pytest.raises(ValueError):
        rolling_window(df, 0)


def test_rolling_window_boundary_inclusive(spark):
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    df = _ev(
        spark,
        [
            (0, 1, t0, "c", 1.0),
            (1, 1, t0.replace(hour=13), "c", 2.0),  # exactly 3600 s later: included
        ],
    )
    out = {r["event_id"]: r for r in rolling_window(df, 3600).collect()}
    assert out[1]["w_count"] == 2 and out[1]["w_sum"] == 3.0


def test_funnel_strict_ordering_and_monotonicity(spark):
    """Hand-built funnel: strictly-after semantics (same-timestamp step does
    NOT advance), per-user earliest chain, monotone counts."""
    from datetime import datetime

    from oaxaca_blinder_rs_spark.operators.funnel import funnel

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1 completes view->click->purchase in order
        (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
        # user 2 clicks BEFORE viewing; the later click at ts(5) advances
        (2, ts(4), "view"), (2, ts(2), "click"), (2, ts(5), "click"),
        # user 3: click at the SAME timestamp as view -> strict > blocks it
        (3, ts(6), "view"), (3, ts(6), "click"),
        # user 4 never views
        (4, ts(1), "click"), (4, ts(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r["n_users"] for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(ev, [])


def test_cohort_retention_hand_computed(spark):
    from datetime import datetime

    from oaxaca_blinder_rs_spark.operators.funnel import cohort_retention

    rows = [
        (1, datetime(2024, 1, 1, 5), "x"), (1, datetime(2024, 1, 2, 6), "x"),
        (1, datetime(2024, 1, 2, 9), "x"),  # same day counted once
        (2, datetime(2024, 1, 1, 8), "x"),
        (3, datetime(2024, 1, 2, 1), "x"), (3, datetime(2024, 1, 4, 1), "x"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {(str(r["cohort_date"]), r["offset"]): r["active_users"]
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
    }


def test_attribution_hand_case_all_models(spark):
    """Hand-built attribution: last/first/linear credit assignment, the
    2-day lookback cut, (direct) fallback, and value crediting."""
    from datetime import datetime

    from oaxaca_blinder_rs_spark.operators.funnel import attribution

    rows = [
        # user 1: view(d1) -> click(d2) -> purchase(d3, 10.0)
        (1, 1, datetime(2024, 1, 1), "view", 0.0),
        (2, 1, datetime(2024, 1, 2), "click", 0.0),
        (3, 1, datetime(2024, 1, 3), "purchase", 10.0),
        # user 2: touch too old for the 2-day lookback -> (direct)
        (4, 2, datetime(2024, 1, 1), "view", 0.0),
        (5, 2, datetime(2024, 1, 9), "purchase", 4.0),
        # user 3: no touches at all -> (direct)
        (6, 3, datetime(2024, 1, 5), "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )

    def got(model):
        return {
            r["channel"]: (r["credit"], r["credited_value"])
            for r in attribution(
                ev, "purchase", ["view", "click"], model=model, lookback_days=2
            ).collect()
        }

    assert got("last_touch") == {"click": (1.0, 10.0), "(direct)": (2.0, 5.0)}
    assert got("first_touch") == {"view": (1.0, 10.0), "(direct)": (2.0, 5.0)}
    lin = got("linear")
    assert lin["view"] == (0.5, 5.0) and lin["click"] == (0.5, 5.0)
    assert lin["(direct)"] == (2.0, 5.0)
    import pytest

    with pytest.raises(ValueError):
        attribution(ev, "purchase", ["view"], model="u_shaped")


def test_attribution_no_window_plan(spark, sf_dir):
    """Scale contract: attribution is user-keyed joins + struct-max
    aggregates; no Window over the event stream."""
    from oaxaca_blinder_rs_spark.operators.funnel import attribution

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = attribution(ev, "purchase", ["view", "click"], model="last_touch")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan


def test_path_transitions_hand_case(spark):
    """Hand-built journey: A -> B -> B plus a single-event user; endpoint
    edges and same-ts tie-break by event_id."""
    from datetime import datetime

    from oaxaca_blinder_rs_spark.operators.funnel import path_transitions

    rows = [
        (1, 1, datetime(2024, 1, 1, 1), "A"),
        (2, 1, datetime(2024, 1, 1, 2), "B"),
        (3, 1, datetime(2024, 1, 1, 2), "B"),  # same ts: ordered by id
        (4, 2, datetime(2024, 1, 1, 5), "C"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {(r["from_type"], r["to_type"]): r["transitions"]
           for r in path_transitions(ev).collect()}
    assert got == {
        ("(start)", "A"): 1, ("A", "B"): 1, ("B", "B"): 1, ("B", "(end)"): 1,
        ("(start)", "C"): 1, ("C", "(end)"): 1,
    }
    inner = {(r["from_type"], r["to_type"]): r["transitions"]
             for r in path_transitions(ev, include_endpoints=False).collect()}
    assert inner == {("A", "B"): 1, ("B", "B"): 1}


def test_flag_anomalies_spike_detection(spark):
    """A stable series with one injected spike: only the spike flags, its
    baseline excludes the spike itself (strict-before frame), and a
    too-short or constant baseline never flags."""
    from datetime import datetime

    from oaxaca_blinder_rs_spark.operators.timeseries import flag_anomalies

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    base = [(1, ts(i), 10.0 + (i % 2)) for i in range(10)]  # mean ~10.5, small std
    rows = base + [(1, ts(10), 100.0), (1, ts(11), 10.0)]
    # key 2: constant series (std 0) and key 3: short series -> never flag
    rows += [(2, ts(i), 5.0) for i in range(8)]
    rows += [(3, ts(i), float(i * 40)) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.ts): r
        for r in flag_anomalies(df, window_seconds=3600, k=3.0).collect()
    }
    spike = out[(1, ts(10))]
    assert spike.is_anomaly and spike.zscore > 3.0
    assert spike.baseline_n == 10 and abs(spike.baseline_mean - 10.5) < 1e-9
    # the row after the spike scores against a baseline CONTAINING the
    # spike (inflated std) and must not flag
    assert not out[(1, ts(11))].is_anomaly
    assert all(not out[(1, ts(i))].is_anomaly for i in range(10))
    assert all(not out[(2, ts(i))].is_anomaly for i in range(8))
    assert all(not out[(3, ts(i))].is_anomaly for i in range(3))
    # hand z-score: baseline of 10 alternating values
    import statistics

    vals = [10.0 + (i % 2) for i in range(10)]
    want_z = (100.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert abs(spike.zscore - round(want_z, 6)) < 1e-9


def test_flag_anomalies_validates(spark):
    import pytest as _pytest

    from oaxaca_blinder_rs_spark.operators.timeseries import flag_anomalies

    df = spark.createDataFrame([(1, "2026-01-01 00:00:00", 1.0)],
                               "user_id long, ts string, value double")
    with _pytest.raises(ValueError):
        flag_anomalies(df, 0)
    with _pytest.raises(ValueError):
        flag_anomalies(df, 60, k=0)


def test_flag_anomalies_boolean_never_null(spark):
    """is_anomaly is a real boolean on every row — empty/constant baselines
    give False, not NULL (a NULL flag silently passes `not r.is_anomaly`
    style checks downstream)."""
    from datetime import datetime

    from oaxaca_blinder_rs_spark.operators.timeseries import flag_anomalies

    rows = [(1, datetime(2026, 1, 1, 0, 0, i), 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = flag_anomalies(df, 3600).collect()
    assert all(r.is_anomaly is False for r in out)
