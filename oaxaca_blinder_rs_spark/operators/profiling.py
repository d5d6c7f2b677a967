"""Data-profiling primitives: histograms and column profiles (net-new).

The first queries run against any unfamiliar 100 TB table: value
distributions and per-column health. Both operators are single-pass
k-ary aggregations — nothing shuffles wider than the bin/column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["equi_width_histogram", "profile_columns"]


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
