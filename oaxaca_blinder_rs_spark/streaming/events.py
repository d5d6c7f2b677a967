"""Structured Streaming surface (net-new; the reference has no streaming —
SURVEY §2.8). Adds the streaming analytics a large-scale pipeline needs over
an `events(event_id, ts, user_id, event_type, value, props)` stream:

- windowed_event_aggregates: tumbling-window counts/sums per event_type with
  a watermark for late data;
- streaming_group_stats: incremental per-group sufficient statistics (the
  same Gram-vector pattern as the batch engine) so a downstream job can
  solve decomposition betas continuously from a stream;
- sessionize: session windows per user.

All are plain readStream->writeStream plans; tests drive them with
availableNow triggers over the driver-provided events parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_event_aggregates", "streaming_group_stats", "sessionize"]


def windowed_event_aggregates(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window aggregates with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "approx_users",
        )
    )


def streaming_group_stats(
    events: DataFrame,
    group_col: str = "event_type",
    ycol: str = "value",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group running sufficient statistics (n, sum, sum of squares) —
    enough to solve means/variances/one-predictor models downstream without
    reprocessing the stream."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(ycol).alias("s1"),
            F.sum(F.col(ycol) * F.col(ycol)).alias("s2"),
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
