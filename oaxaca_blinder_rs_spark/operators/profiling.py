"""Data-profiling primitives: histograms and column profiles (net-new).

The first queries run against any unfamiliar 100 TB table: value
distributions and per-column health. Both operators are single-pass
k-ary aggregations — nothing shuffles wider than the bin/column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["equi_width_histogram", "profile_columns", "histogram_quantiles"]


def equi_width_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n) for every
    bin 0..bins-1, zero-count bins included (a dense spine join, so the
    result plots directly). Bounds default to the column min/max (one tiny
    pre-aggregate); values exactly at ``hi`` fall in the last bin, the
    standard closed-right-edge convention. Nulls are dropped.

    Scale: one map-side bin projection + ONE groupBy over <= bins keys
    with partial counts; the spine join is a broadcast of `bins` rows.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else float(lo)
        hi = float(row["hi"]) if hi is None else float(hi)
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    bin_expr = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(bins - 1)
    )
    counts = (
        df.filter(c.isNotNull() & (c >= lo) & (c <= hi))
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column health profile: (column, n, nulls, null_frac, n_distinct,
    min_s, max_s, mean) — n_distinct is EXACT (use sketches.hll_* for the
    approximate scale path), min/max rendered as strings so numeric and
    string columns share one schema, mean null for non-numerics.

    Scale: one aggregation per column over a shared scan (Spark computes
    all aggregates in a single pass when expressed in one agg; here one
    pass per column keeps exact distinct counts separable). For wide
    tables at extreme scale, swap n_distinct for the HLL estimate.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("double", "float", "integer", "long", "short", "byte", "decimal")
    }
    out = None
    n_total = df.count()
    for c in cols:
        col = F.col(c)
        agg = df.agg(
            F.sum(col.isNull().cast("long")).alias("nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_s"),
            F.max(col).cast("string").alias("max_s"),
            (F.round(F.avg(col.cast("double")), 6) if c in numeric else F.lit(None).cast("double")).alias("mean"),
        ).select(
            F.lit(c).alias("column"),
            F.lit(n_total).cast("long").alias("n"),
            F.col("nulls"),
            F.round(F.col("nulls") / F.lit(float(n_total)), 6).alias("null_frac"),
            "n_distinct",
            "min_s",
            "max_s",
            "mean",
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def histogram_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    bins: int = 128,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Approximate quantiles from an equi-width histogram: (q, est, bin,
    bin_lo, bin_hi, n_bin) per requested quantile, with the TRUE quantile
    guaranteed inside [bin_lo, bin_hi] — absolute error <= (hi-lo)/bins.

    The mergeable scale-twin of the exact type-7 quantile (A7): per-bin
    counts are a (bin -> count) table that merges by SUM across shards,
    days, or partial scans — so a 100 TB quantile costs one map-side bin
    projection + a <= `bins`-key groupBy, never a global sort, and
    pre-aggregated per-day tables roll up without rescanning. Estimate:
    for rank r = q*N, find the bin with cum_prev < r <= cum (empty bins
    can never bracket) and interpolate linearly within it —
    est = lo + (bin + (r - cum_prev)/n_bin) * width. Deterministic pure
    arithmetic over integer counts, replayed exactly by the DuckDB oracle
    (histogram_quantiles row). qs must lie in (0, 1].
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else float(lo)
        hi = float(row["hi"]) if hi is None else float(hi)
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    bin_expr = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(bins - 1)
    )
    counts = (
        df.filter(c.isNotNull() & (c >= lo) & (c <= hi))
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = counts.select(
        "bin", "n",
        F.sum("n").over(w_all).alias("cum"),
        (F.sum("n").over(w_all) - F.col("n")).alias("cum_prev"),
        F.sum("n").over(w_tot).alias("total"),
    )
    spine = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    r = F.col("q") * F.col("total")
    return (
        spine.crossJoin(cum)
        .filter((r > F.col("cum_prev")) & (r <= F.col("cum")))
        .select(
            "q",
            F.round(
                F.lit(lo)
                + (F.col("bin") + (r - F.col("cum_prev")) / F.col("n")) * F.lit(width),
                6,
            ).alias("est"),
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            F.col("n").alias("n_bin"),
        )
    )
