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

__all__ = [
    "kde_on_grid",
    "kde_on_grid_many",
    "kde_at_point",
    "silverman_bandwidth",
    "order_stats",
]


def _spread(df: DataFrame) -> DataFrame:
    """r14 OPT (guide §2.5 input skew): the grid explode multiplies per-row
    work by |grid|, so an under-partitioned input (e.g. the 3-split sf0.1
    lineitem scan) serializes the whole kernel evaluation onto a few cores
    — profiled as ~7 s of 3-task stages in the sf0.1 DFL isolate.
    Partitioning only: partial-aggregation merge order moves the sums by
    last-ulp amounts, the tolerance class the fused/multi-density path
    already documents (oracle re-verified at 3 SFs after this change). At
    real scale the scan has many splits and this never fires."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(par, 8):
        return df.repartition(par)
    return df


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
    exploded = _spread(df).select(
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


def kde_on_grid_many(
    df: DataFrame,
    ycol: str,
    grid: list[float],
    specs: list[tuple[str, "F.Column | None", "F.Column | None", float]],
) -> dict[str, list[float]]:
    """Several weighted KDEs over the SAME frame and grid in ONE pass
    (r14 OPT, guide §1.2): ``specs`` is a list of
    (name, row-condition-or-None, weight-column-or-None, bandwidth).

    Each density f_s(g) = sum_{cond_s} w_s K((g - y)/h_s) / sum w_s / h_s —
    exactly ``kde_on_grid`` of the cond-filtered frame, but evaluated as
    conditional sums so the grid explode (|rows| x |grid| generated rows)
    and the frame scan happen once for ALL densities instead of once per
    density. Excluded rows contribute exact +0.0 to each sum (IEEE x+0.0
    == x), so per-density results equal the separate-call values up to
    partial-aggregation merge order — the same tolerance class the
    single-call path already has. Distinct bandwidths share the explode;
    the per-row kernel is evaluated once per DISTINCT bandwidth.
    """
    g = F.col("__grid")
    proj = [F.col(ycol).cast("double").alias("__y")]
    for i, (_, cond, w, _h) in enumerate(specs):
        wexpr = (w if w is not None else F.lit(1.0)).cast("double")
        if cond is not None:
            wexpr = F.when(cond, wexpr).otherwise(F.lit(0.0))
        proj.append(wexpr.alias(f"__w_{i}"))
    exploded = _spread(df).select(
        *proj, F.explode(F.array(*[F.lit(float(x)) for x in grid])).alias("__grid")
    )
    pdf_by_h: dict[float, F.Column] = {}
    for _, _, _w, h in specs:
        hf = float(h)
        if hf not in pdf_by_h:
            pdf_by_h[hf] = norm_pdf((g - F.col("__y")) / F.lit(hf))
    aggs = []
    for i, (_, _c, _w, h) in enumerate(specs):
        hf = float(h)
        aggs.append(
            (
                F.sum(F.col(f"__w_{i}") * pdf_by_h[hf])
                / F.sum(f"__w_{i}")
                / F.lit(hf)
            ).alias(f"__d_{i}")
        )
    rows = exploded.groupBy("__grid").agg(*aggs).collect()
    by_grid = {float(r["__grid"]): r for r in rows}
    return {
        name: [float(by_grid[float(x)][f"__d_{i}"]) for x in grid]
        for i, (name, _c, _w, _h) in enumerate(specs)
    }


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

    A per-group (or global) row_number() would funnel each group through one
    task. Instead the column is range-partitioned on (group, y) so ranks are
    contiguous per (group, partition) cell, one small count aggregation
    yields per-cell rank offsets, and only the cells that actually contain a
    wanted index are locally sorted — O(n/P log n/P) work on <= |groups| *
    |idxs| cells, never a single-task scan of a whole group.
    """
    wanted = sorted({int(i) for i in idxs})
    gcol = group if group is not None else "__os_g"
    head = [F.col(group)] if group is not None else [F.lit(0).alias("__os_g")]
    sel = df.select(*head, F.col(ycol).cast("double").alias(ycol))
    nparts = max(sel.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        sel.repartitionByRange(nparts, F.col(gcol).asc(), F.col(ycol).asc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = ranged.groupBy(gcol, "__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect()
        by_g: dict = {}
        for r in counts:
            by_g.setdefault(r[gcol], []).append((int(r["__pid"]), int(r["__cnt"])))
        cells: dict = {}
        offsets: dict = {}
        for g, lst in by_g.items():
            running = 0
            it = iter(wanted)
            nxt = next(it, None)
            for pid_, c in sorted(lst):
                offsets[(g, pid_)] = running
                hi = running + c
                while nxt is not None and nxt < hi:
                    cells.setdefault((g, pid_), []).append(nxt - running)
                    nxt = next(it, None)
                running = hi
        if not cells:
            return {}
        cond = None
        for (g, p), lrs in cells.items():
            c = F.col(gcol).eqNullSafe(F.lit(g)) & (F.col("__pid") == p) & F.col("__lrn").isin(lrs)
            cond = c if cond is None else (cond | c)
        w = Window.partitionBy(gcol, "__pid").orderBy(F.col(ycol).asc())
        rows = (
            ranged.filter(F.col("__pid").isin(sorted({p for _, p in cells})))
            .withColumn("__lrn", F.row_number().over(w) - 1)
            .filter(cond)
            .collect()
        )
        if group is None:
            return {offsets[(r[gcol], r["__pid"])] + int(r["__lrn"]): float(r[ycol]) for r in rows}
        return {
            (r[gcol], offsets[(r[gcol], r["__pid"])] + int(r["__lrn"])): float(r[ycol])
            for r in rows
        }
    finally:
        ranged.unpersist()


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
