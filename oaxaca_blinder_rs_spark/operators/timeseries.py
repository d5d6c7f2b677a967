"""Time-series operators over the events stream/table (net-new surface,
complementing the hourly rollup, sessionization and as-of/range joins).

- gap_fill_hourly: dense calendar spine — every (bucket, group) cell between
  the corpus's first and last hour exists, empty cells as zeros. Downstream
  models (anomaly detection, forecasting) need the zeros; a groupBy alone
  silently skips them.
- rolling_window: per-row trailing-window aggregates (count/sum over the
  preceding N seconds per key) via a RANGE window on epoch seconds — the
  feature-engineering staple ("events in the last hour for this user").

Both are single window/join plans on uniform keys; the spine is two scalar
aggregates plus a sequence explode, never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gap_fill_hourly", "rolling_window", "flag_anomalies"]


def gap_fill_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series: (hour_start string, group, n_events, sum_value)
    with a row for EVERY hour x group combination in the corpus's time
    span — missing cells zero-filled.

    Spine = sequence(min hour, max hour, 1h) exploded once, cross-joined
    with the distinct groups (both tiny), left-joined with the actual
    hourly aggregate. One aggregation shuffle + one broadcast-ready join.
    """
    t = F.col(ts_col).cast("timestamp")
    hour = F.date_trunc("hour", t)
    agg = events.groupBy(
        hour.alias("__h"), F.col(group_col).alias("__g")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col(value_col)), 6).alias("sum_value"),
    )
    span = events.select(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    spine_hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("__h")
    )
    groups = events.select(F.col(group_col).alias("__g")).distinct()
    spine = spine_hours.crossJoin(groups)
    return (
        spine.join(agg, ["__h", "__g"], "left")
        .select(
            F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.col("__g").alias(group_col),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


def rolling_window(
    events: DataFrame,
    window_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    prefix: str = "w_",
) -> DataFrame:
    """Trailing-window features per event: every input row plus
    ``{prefix}count`` and ``{prefix}sum`` over the same key's rows in the
    preceding ``window_seconds`` (inclusive of the current row).

    A RANGE window on epoch seconds partitioned by the key — at
    feature-store key cardinality the work is uniform; no self-join, no
    explode, one shuffle on the key.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(key_col)
        .orderBy(epoch)
        .rangeBetween(-int(window_seconds), 0)
    )
    return events.select(
        "*",
        F.count(F.lit(1)).over(w).alias(f"{prefix}count"),
        F.round(F.sum(F.col(value_col)).over(w), 6).alias(f"{prefix}sum"),
    )


def flag_anomalies(
    events: DataFrame,
    window_seconds: int,
    k: float = 3.0,
    min_baseline: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Rolling z-score anomaly flags per event: every input row plus
    (baseline_n, baseline_mean, baseline_std, zscore, is_anomaly) computed
    against the SAME key's rows in the preceding ``window_seconds``
    STRICTLY BEFORE the current row — the current value never contaminates
    its own baseline, so a lone spike scores against clean history.

    is_anomaly = |x - mean| > k * std over a baseline of at least
    ``min_baseline`` rows with positive std (too-short or constant
    baselines flag nothing — the standard cold-start rule). std is
    derived from trailing SUM and SUM(x^2) in one RANGE frame (n-1
    denominator), not a windowed stddev aggregate, so the arithmetic is
    two deterministic frame sums. One shuffle on the key, no self-join —
    the same scale shape as rolling_window.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    v = F.col(value_col).cast("double")
    w = (
        Window.partitionBy(key_col)
        .orderBy(epoch)
        .rangeBetween(-int(window_seconds), -1)
    )
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    # guard the empty/singleton baseline explicitly: ANSI mode makes the
    # bare divisions throw on the first rows of every key
    mean = F.when(n > 0, s1 / n)
    var = F.when(n > 1, (s2 - s1 * s1 / n) / (n - 1))
    # keep std NULL (undefined) for n <= 1 rather than 0.0: greatest()
    # ignores nulls, so the clamp must stay inside the n > 1 gate
    std = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
    z = F.when(std > 0, (v - mean) / std)
    return events.select(
        "*",
        n.cast("long").alias("baseline_n"),
        F.round(mean, 6).alias("baseline_mean"),
        F.round(std, 6).alias("baseline_std"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(
            (n >= int(min_baseline)) & (std > 0) & (F.abs(z) > float(k)),
            F.lit(False),
        ).alias("is_anomaly"),
    )
