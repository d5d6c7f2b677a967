"""asof_join semantics: inclusive backward match, per-key isolation,
tolerance nulling — hand-computed fixtures."""

from datetime import datetime

import pytest

from oaxaca_blinder_rs_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(4)),   # before any state -> null
            (2, "u1", _ts(10)),  # equal ts -> inclusive match v=2
            (3, "u1", _ts(11)),  # latest prior is t=10
            (4, "u2", _ts(30)),  # other key: only u2 states visible
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 1.0),
            ("u1", _ts(10), 2.0),
            ("u1", _ts(12), 3.0),
            ("u2", _ts(1), 9.0),
        ],
        "user string, ts timestamp, state double",
    )
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = {r["event_id"]: r for r in asof_join(left, right, "ts", "user").collect()}
    assert out[1]["asof_state"] is None and out[1]["asof_ts"] is None
    assert out[2]["asof_state"] == 2.0 and out[2]["asof_ts"] == _ts(10)
    assert out[3]["asof_state"] == 2.0
    assert out[4]["asof_state"] == 9.0 and out[4]["asof_ts"] == _ts(1)
    assert len(out) == left.count()  # left join: every left row survives


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, "ts", "user", tolerance_seconds=5).collect()
    }
    assert out[3]["asof_state"] == 2.0      # 1s old: inside tolerance
    assert out[4]["asof_state"] is None     # 29s old: stale -> nulled
    assert out[4]["asof_ts"] is None


def test_asof_right_cols_validation(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "ts", "user", right_cols=["nope"]).collect()
    with pytest.raises(ValueError):
        asof_join(left, right, "ts", "ts").collect()


def test_asof_forward_inclusive(spark, frames):
    left, right = frames
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, "ts", "user", direction="forward").collect()
    }
    assert out[1]["asof_state"] == 1.0 and out[1]["asof_ts"] == _ts(5)   # next at t=5
    assert out[2]["asof_state"] == 2.0 and out[2]["asof_ts"] == _ts(10)  # equal ts inclusive
    assert out[3]["asof_state"] == 3.0                                   # next at t=12
    assert out[4]["asof_state"] is None                                  # nothing after t=30


def test_asof_forward_tolerance(spark, frames):
    left, right = frames
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "ts", "user", direction="forward", tolerance_seconds=1
        ).collect()
    }
    assert out[1]["asof_state"] == 1.0   # t=4 -> t=5 is 1s: inside tolerance
    assert out[3]["asof_state"] == 3.0   # t=11 -> t=12 is 1s: kept
    assert out[4]["asof_state"] is None  # no following state at all


def test_asof_direction_validation(spark, frames):
    left, right = frames
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, "ts", "user", direction="nearest")


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (an independent
    implementation of the same semantics), both directions, with keys."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    left_pd = pd.DataFrame(
        {
            "eid": np.arange(n_l),
            "k": rng.integers(0, 5, n_l).astype(str),
            "t": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r).astype(str),
            "t": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
            "v": np.round(rng.normal(size=n_r), 6),
        }
    )
    # merge_asof needs unique (k, t) on the right for a deterministic match
    right_pd = right_pd.drop_duplicates(subset=["k", "t"], keep="last")

    left = spark.createDataFrame(left_pd.rename(columns={"t": "ts"}))
    right = spark.createDataFrame(right_pd.rename(columns={"t": "ts"}))
    for direction in ("backward", "forward"):
        got = {
            r["eid"]: r["asof_v"]
            for r in asof_join(left, right, "ts", "k", direction=direction).collect()
        }
        want_df = pd.merge_asof(
            left_pd.sort_values("t"),
            right_pd.sort_values("t"),
            on="t",
            by="k",
            direction=direction,
            allow_exact_matches=True,
        )
        want = dict(zip(want_df["eid"], want_df["v"]))
        for eid in want:
            g, w = got[eid], want[eid]
            assert (g is None and pd.isna(w)) or g == w, (direction, eid, g, w)


def test_asof_strict_excludes_same_timestamp(spark, frames):
    left, right = frames
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "ts", "user", allow_exact_matches=False
        ).collect()
    }
    # event at t=10 must now skip the t=10 state and take t=5
    assert out[2]["asof_state"] == 1.0 and out[2]["asof_ts"] == _ts(5)
    fwd = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "ts", "user", direction="forward", allow_exact_matches=False
        ).collect()
    }
    # forward-strict at t=10 skips t=10 and takes t=12
    assert fwd[2]["asof_state"] == 3.0 and fwd[2]["asof_ts"] == _ts(12)


def test_asof_strict_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    left_pd = pd.DataFrame(
        {
            "eid": np.arange(150),
            "k": rng.integers(0, 4, 150).astype(str),
            "t": pd.to_datetime(rng.integers(0, 500, 150), unit="s"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120).astype(str),
            "t": pd.to_datetime(rng.integers(0, 500, 120), unit="s"),
            "v": np.round(rng.normal(size=120), 6),
        }
    ).drop_duplicates(subset=["k", "t"], keep="last")
    left = spark.createDataFrame(left_pd.rename(columns={"t": "ts"}))
    right = spark.createDataFrame(right_pd.rename(columns={"t": "ts"}))
    got = {
        r["eid"]: r["asof_v"]
        for r in asof_join(left, right, "ts", "k", allow_exact_matches=False).collect()
    }
    want_df = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("t"),
        on="t", by="k", direction="backward", allow_exact_matches=False,
    )
    want = dict(zip(want_df["eid"], want_df["v"]))
    for eid in want:
        g, w = got[eid], want[eid]
        assert (g is None and pd.isna(w)) or g == w, (eid, g, w)


def test_asof_duplicate_right_rows_deterministic(spark):
    """Duplicate right rows at the same (key, time) with different payloads:
    the payload tie-break makes the pick deterministic — backward takes the
    greatest payload tuple, forward the least (round-5 ADVICE regression)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), 1.0), ("u1", _ts(5), 9.0), ("u1", _ts(5), 4.0)],
        "user string, ts timestamp, v double",
    )
    for _ in range(3):
        out = asof_join(
            left.repartition(4), right.repartition(3), "ts", by="user"
        ).collect()
        assert len(out) == 1 and out[0]["asof_v"] == 9.0
    fwd = asof_join(left, right, "ts", by="user", direction="forward")
    # no right row at-or-after ts(10) -> null; with forward from ts(2) the
    # least payload of the tied ts(5) rows is picked
    left2 = spark.createDataFrame(
        [(1, "u1", _ts(2))], "event_id long, user string, ts timestamp"
    )
    out2 = asof_join(left2, right, "ts", by="user", direction="forward").collect()
    assert out2[0]["asof_v"] == 1.0


def test_asof_map_payload_not_orderable_still_joins(spark):
    """A map-typed right payload can't be part of an ORDER BY; the tie-break
    must silently drop it (r5 ADVICE) instead of raising AnalysisException
    at plan time. Orderable payloads in the same join still tie-break."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), 7.0, {"a": 1})],
        "user string, ts timestamp, v double, props map<string,int>",
    )
    out = asof_join(left, right, "ts", by="user").collect()
    assert len(out) == 1
    assert out[0]["asof_v"] == 7.0
    assert dict(out[0]["asof_props"]) == {"a": 1}


def test_quantile_builder_design_cache_invalidation(spark, sf_dir):
    """predictors()/categorical_predictors() after a _prepare_design must
    drop the memoized design (r5 ADVICE): reconfigure-then-run refits on
    the new design rather than silently reusing the stale matrix."""
    import os

    from oaxaca_blinder_rs_spark.quantile_builder import QuantileDecompositionBuilder

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    b = (
        QuantileDecompositionBuilder(li, "l_extendedprice", "l_returnflag", "R")
        .predictors(["l_quantity"])
    )
    _, xcols1, _, _ = b._prepare_design()
    b.predictors(["l_quantity", "l_discount"])
    _, xcols2, _, _ = b._prepare_design()
    assert "l_discount" in xcols2 and "l_discount" not in xcols1
