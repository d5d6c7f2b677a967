"""Gaussian KDE as Spark aggregations (SURVEY A9/A10) + Silverman bandwidth.

Reference: /root/reference/oaxaca_blinder/src/math/kde.rs. The reference
loops grid x data on one core; here the data axis is distributed: the grid
(100 points) is exploded per row map-side and partial aggregation reduces to
|grid| rows — one shuffle of 100 rows regardless of n.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.mathx import norm_pdf

__all__ = ["kde_on_grid", "kde_at_point", "silverman_bandwidth", "order_stats"]


def kde_on_grid(
    df: DataFrame,
    ycol: str,
    grid: list[float],
    bandwidth: float,
    wcol: str | None = None,
) -> list[float]:
    """Weighted Gaussian KDE evaluated on a fixed grid (kde.rs:20-41).

    f(g) = sum_i w_i K((g - y_i)/h) / h with weights normalized to sum 1.
    """
    w = F.col(wcol) if wcol else F.lit(1.0)
    g = F.col("__grid")
    exploded = df.select(
        F.col(ycol).cast("double").alias("__y"),
        w.cast("double").alias("__w"),
        F.explode(F.array(*[F.lit(float(x)) for x in grid])).alias("__grid"),
    )
    u = (g - F.col("__y")) / F.lit(float(bandwidth))
    rows = (
        exploded.groupBy("__grid")
        .agg(
            (F.sum(F.col("__w") * norm_pdf(u)) / F.sum("__w") / F.lit(float(bandwidth))).alias("__d")
        )
        .collect()
    )
    by_grid = {float(r["__grid"]): float(r["__d"]) for r in rows}
    return [by_grid[float(x)] for x in grid]


def kde_at_point(df: DataFrame, ycol: str, point: float, bandwidth: float, wcol: str | None = None) -> float:
    """Density at a single point (math/rif.rs:61-75): one aggregate."""
    w = F.col(wcol) if wcol else F.lit(1.0)
    u = (F.lit(float(point)) - F.col(ycol)) / F.lit(float(bandwidth))
    row = df.agg(
        (F.sum(w * norm_pdf(u)) / F.sum(w) / F.lit(float(bandwidth))).alias("__d")
    ).collect()[0]
    return float(row["__d"])


def order_stats(df: DataFrame, ycol: str, idxs: list[int], group: str | None = None) -> dict:
    """Exact 0-based order statistics via distributed selection.

    Returns {idx: value} (ungrouped) or {(group_value, idx): value}.

    Ungrouped path: a global row_number() would funnel every row through one
    partition. Instead the column is range-partitioned (ranks become
    contiguous per partition), per-partition counts give cumulative rank
    offsets, and only the partitions that actually contain a wanted index
    are locally sorted — the sort cost is O(n/P log n/P) on <=|idxs|
    partitions, never a single-partition exchange.

    Grouped path keeps a per-group window: the reference needs exact
    per-group ranks and groups are the parallelism unit (skewed single
    groups would need the same range-split applied within the group).
    """
    wanted = sorted({int(i) for i in idxs})
    if group is None:
        vals = df.select(F.col(ycol).cast("double").alias(ycol))
        nparts = max(vals.sparkSession.sparkContext.defaultParallelism, 1)
        ranged = (
            vals.repartitionByRange(nparts, F.col(ycol).asc())
            .withColumn("__pid", F.spark_partition_id())
            .persist()
        )
        try:
            counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).orderBy("__pid").collect()
            locals_by_pid: dict[int, list[int]] = {}
            running = 0
            it = iter(wanted)
            nxt = next(it, None)
            for r in counts:
                hi = running + r["__cnt"]
                while nxt is not None and nxt < hi:
                    locals_by_pid.setdefault(r["__pid"], []).append(nxt - running)
                    nxt = next(it, None)
                running = hi
            if not locals_by_pid:
                return {}
            cond = None
            for p, lrs in locals_by_pid.items():
                c = (F.col("__pid") == p) & F.col("__lrn").isin(lrs)
                cond = c if cond is None else (cond | c)
            w = Window.partitionBy("__pid").orderBy(F.col(ycol).asc())
            rows = (
                ranged.filter(F.col("__pid").isin(list(locals_by_pid)))
                .withColumn("__lrn", F.row_number().over(w) - 1)
                .filter(cond)
                .collect()
            )
            offsets = {}
            running = 0
            for r in counts:
                offsets[r["__pid"]] = running
                running += r["__cnt"]
            return {offsets[r["__pid"]] + int(r["__lrn"]): float(r[ycol]) for r in rows}
        finally:
            ranged.unpersist()
    w = Window.partitionBy(group).orderBy(F.col(ycol).asc())
    ranked = df.select(group, ycol).withColumn("__rn", F.row_number().over(w) - 1)
    rows = ranked.filter(F.col("__rn").isin(wanted)).collect()
    return {(r[group], int(r["__rn"])): float(r[ycol]) for r in rows}


def silverman_bandwidth(df: DataFrame, ycol: str) -> float:
    """kde.rs:44-59 convention: sd (n-1) and IQR via FLOOR (n*p) indexing."""
    row = df.agg(
        F.count(ycol).alias("n"),
        F.variance(ycol).alias("var"),
    ).collect()[0]
    n = int(row["n"])
    sd = math.sqrt(float(row["var"]))
    i25 = int(n * 0.25)
    i75 = int(n * 0.75)
    os_ = order_stats(df, ycol, [i25, i75])
    iqr = os_[i75] - os_[i25]
    a = min(sd, iqr / 1.34)
    return 0.9 * a * n ** (-0.2)
