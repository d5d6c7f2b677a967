"""Bootstrap inference (SURVEY M11) — the flagship Spark-native redesign.

The reference loops B times over rayon threads, materially resampling frames
(/root/reference/oaxaca_blinder/src/builder.rs:816-847). On Spark that would
be B jobs. Instead we add a *replicate dimension* to the data and compute ALL
B replicates' sufficient statistics in ONE aggregation:

    df -> explode rep=0..B-1 -> deterministic per-(row, rep) resample count
       -> groupBy(rep, group).agg(Gram exprs weighted by count)
       -> B x 2 tiny rows collected -> B driver-side k x k solves.

Two resampling methods:

- ``poisson`` (default, scale path): each row appears Poisson(1) times per
  replicate. No join, no sort; the exploded rows flow straight into partial
  (map-side) aggregation, so the only shuffle is B x 2 x O(k^2) doubles.
  Statistically standard for huge-n bootstraps.
- ``exact``: exact-n-with-replacement per group, matching the reference's
  ``sample_n_literal(height, true, ...)`` semantics (builder.rs:822-828).
  Implemented as a deterministic multinomial: B*n index picks generated from
  a hash, aggregated to per-(row, rep) counts, joined back on a within-group
  row index. One window + one shuffle join — use when B*n is moderate or
  reference-parity semantics matter.

All randomness is a pure function of (seed, rep, row_id): reruns hash-match
(SURVEY §7.1 determinism-first).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.linalg import GroupStats, gram_agg_exprs, stats_from_row

__all__ = ["bootstrap_stats", "bootstrap_group_stats", "poisson_count_expr", "hash_uniform"]

_U_DENOM = float(1 << 40)


def hash_uniform(*cols: Column) -> Column:
    """Deterministic U[0,1) from arbitrary columns via xxhash64."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 40)).cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)


def poisson_count_expr(u: Column, max_k: int = 12) -> Column:
    """Poisson(1) count via inverse-CDF on a uniform — pure Catalyst CASE.

    P(K > 12) < 1e-13; the tail is capped at max_k.
    """
    cdf = 0.0
    pmf = math.exp(-1.0)
    expr = None
    for k in range(max_k):
        cdf += pmf
        cond = u < F.lit(cdf)
        expr = F.when(cond, F.lit(k)) if expr is None else expr.when(cond, F.lit(k))
        pmf /= k + 1
    return expr.otherwise(F.lit(max_k))


def bootstrap_stats(estimates: list[float], point_estimate: float) -> tuple[float, float, tuple[float, float]]:
    """Driver-side SE / p-value / percentile CI, mirroring inference.rs:4-34.

    SE = sd (n-1 denominator); p = min(1, 2*min(frac>=0, frac<=0));
    CI = sorted[floor(0.025 B)], sorted[min(floor(0.975 B), B-1)].
    """
    if not estimates:
        return (math.nan, math.nan, (math.nan, math.nan))
    n = float(len(estimates))
    mean = sum(estimates) / n
    if len(estimates) > 1:
        std_err = math.sqrt(sum((v - mean) ** 2 for v in estimates) / (n - 1.0))
    else:
        std_err = math.nan
    prop_pos = sum(1 for v in estimates if v >= 0.0) / n
    prop_neg = sum(1 for v in estimates if v <= 0.0) / n
    p_value = min(2.0 * min(prop_pos, prop_neg), 1.0)
    s = sorted(estimates)
    lower_idx = int(math.floor(0.025 * n))
    upper_idx = min(int(math.floor(0.975 * n)), len(estimates) - 1)
    return (std_err, p_value, (s[lower_idx], s[upper_idx]))


def bootstrap_group_stats(
    df: DataFrame,
    xcols: list[str],
    ycol: str,
    group: str,
    reps: int,
    seed: int,
    wcol: str | None = None,
    id_col: str = "__ob_row_id__",
    method: str = "poisson",
    group_sizes: dict[str, int] | None = None,
) -> dict[int, dict[str, GroupStats]]:
    """All B replicates' per-group sufficient statistics in one Spark job."""
    if method == "poisson":
        boot = df.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        u = hash_uniform(F.col(id_col), F.col("__rep"), F.lit(seed))
        boot = boot.withColumn("__cnt", poisson_count_expr(u).cast("double"))
    elif method == "exact":
        if not group_sizes:
            group_sizes = {r[0]: r[1] for r in df.groupBy(group).count().collect()}
        spark = df.sparkSession
        picks = None
        for gval, n_g in group_sizes.items():
            p = (
                spark.range(reps * n_g)
                .select(
                    F.lit(gval).alias(group),
                    (F.col("id") / n_g).cast("long").alias("__rep"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(str(gval))), F.lit(n_g)).alias("__pick"),
                )
            )
            picks = p if picks is None else picks.unionByName(p)
        counts = picks.groupBy(group, "__rep", "__pick").agg(
            F.count(F.lit(1)).cast("double").alias("__cnt")
        )
        w_idx = Window.partitionBy(group).orderBy(id_col)
        base = df.withColumn("__gidx", F.row_number().over(w_idx) - 1)
        boot = base.join(
            counts,
            on=[base[group] == counts[group], base["__gidx"] == counts["__pick"]],
        ).drop(counts[group]).drop("__pick", "__gidx")
    else:
        raise ValueError(f"unknown bootstrap method: {method}")

    if wcol is not None:
        boot = boot.withColumn("__bw", F.col("__cnt") * F.col(wcol))
    else:
        boot = boot.withColumn("__bw", F.col("__cnt"))
    boot = boot.filter(F.col("__cnt") > 0)

    aggs = gram_agg_exprs(xcols, ycol, wcol="__bw", count_expr=F.col("__cnt"))
    rows = boot.groupBy("__rep", group).agg(*aggs).collect()
    out: dict[int, dict[str, GroupStats]] = {}
    for r in rows:
        out.setdefault(int(r["__rep"]), {})[r[group]] = stats_from_row(r, xcols, has_y=True)
    return out
