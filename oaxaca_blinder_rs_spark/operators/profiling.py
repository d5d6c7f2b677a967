"""Data-profiling primitives: histograms and column profiles (net-new).

The first queries run against any unfamiliar 100 TB table: value
distributions and per-column health. Both operators are single-pass
k-ary aggregations — nothing shuffles wider than the bin/column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "equi_width_histogram",
    "profile_columns",
    "histogram_quantiles",
    "drift_report",
    "drift_bucket_counts",
    "psi_from_counts",
    "drift_metrics",
    "quantile_sketch_check",
    "topk_per_group",
    "binary_auc",
    "roc_points",
]


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
    group_cols: list[str] | None = None,
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

    With `group_cols`, everything runs per group over SHARED bounds (one
    extra row per group per q): counts key on (group, bin) — still one
    keyed groupBy — and the cumulative window partitions by group, so a
    per-key p99 over a 100 TB table is a (groups x bins)-key aggregation,
    never a per-key sort. Shared bounds keep the per-group tables
    mergeable with each other and with the global one.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    groups = list(group_cols or [])
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
        .groupBy(*[F.col(g) for g in groups], bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = (
        Window.partitionBy(*groups).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*groups).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        *groups, "bin", "n",
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
            *groups,
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


def _drift_long_form(
    df: DataFrame,
    cat_cols: list[str],
    num_cols: list[str],
    bins: int,
    edges: dict[str, tuple[float, float]],
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared (dim, bucket) projection behind every drift face: categorical
    columns bucket by value (nulls -> "(null)"); numeric columns by `bins`
    equi-width bins over `edges[col]` with the closed-right-edge
    convention, out-of-range and null values dropped. `extra_cols` pass
    through untouched (the streaming face keeps its event-time column).

    ONE scan: every dim's (dim, bucket) struct is built in a single
    projection — numeric entries null out when the value is null or out
    of range and are filtered from the array — then exploded. A
    union-of-projections shape would scan the input once PER DIM; at
    100 TB the scan dominates, so the generate form is the right one
    (still pure codegen, no shuffle)."""
    entries = []
    for c in cat_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("dim"),
                F.coalesce(F.col(c).cast("string"), F.lit("(null)")).alias("bucket"),
            )
        )
    for c in num_cols:
        lo, hi = edges[c]
        width = (hi - lo) / bins
        col = F.col(c).cast("double")
        bin_expr = F.least(
            F.floor((col - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(bins - 1),
        )
        entries.append(
            F.when(
                col.isNotNull() & (col >= lo) & (col <= hi),
                F.struct(F.lit(c).alias("dim"), bin_expr.cast("string").alias("bucket")),
            )
        )
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return df.select(F.explode(arr).alias("__e"), *[F.col(c) for c in extra_cols]).select(
        F.col("__e.dim").alias("dim"),
        F.col("__e.bucket").alias("bucket"),
        *[F.col(c) for c in extra_cols],
    )


def _drift_edges(
    num_cols: list[str],
    bounds: dict[str, tuple[float, float]] | None,
    frames: list[DataFrame],
) -> dict[str, tuple[float, float]]:
    """Resolve per-column bin bounds: explicit `bounds` win (the fixed
    a-priori range a stream requires and a stable serving contract wants);
    otherwise the global [min, max] across all `frames` (one tiny
    pre-aggregate each), so bucket edges are identical on every side by
    construction."""
    edges: dict[str, tuple[float, float]] = {}
    for c in num_cols:
        if bounds and c in bounds:
            lo, hi = float(bounds[c][0]), float(bounds[c][1])
        else:
            col = F.col(c).cast("double")
            los, his = [], []
            for df in frames:
                l, h = df.agg(F.min(col), F.max(col)).collect()[0]
                los.append(l)
                his.append(h)
            lo, hi = float(min(los)), float(max(his))
        if not hi > lo:
            raise ValueError(f"need hi > lo for {c}, got [{lo}, {hi}]")
        edges[c] = (lo, hi)
    return edges


def drift_bucket_counts(
    df: DataFrame,
    cat_cols: list[str] | None = None,
    num_cols: list[str] | None = None,
    bins: int = 10,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """One snapshot's (dim, bucket, n) count table — the mergeable half of
    the PSI computation: counts merge by per-(dim, bucket) SUM across
    shards, days or streaming windows, so a reference distribution is
    computed once and compared against any number of serving windows via
    psi_from_counts. Numeric dims need `bounds` (or they default to this
    one snapshot's [min, max], which only matches another snapshot's
    buckets if you pass the same bounds there)."""
    cat_cols = cat_cols or []
    num_cols = num_cols or []
    if not cat_cols and not num_cols:
        raise ValueError("need at least one of cat_cols / num_cols")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    edges = _drift_edges(num_cols, bounds, [df])
    return (
        _drift_long_form(df, cat_cols, num_cols, bins, edges)
        .groupBy("dim", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_from_counts(
    ref_counts: DataFrame,
    live_counts: DataFrame,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI report from two (dim, bucket, n) count tables (reference = the
    'a' side, live = 'b'): full-outer join on (dim, bucket) with zero
    fill, per-dim totals broadcast back, shares clamped at `eps` before
    the log. Output schema matches drift_report exactly, so batch and
    streaming drift pipelines share one downstream contract. Both inputs
    are bins x dims-sized tables — this step is O(buckets), not O(rows)."""
    return _psi_finish(_aligned_counts(ref_counts, live_counts), eps)


def _aligned_counts(ref_counts: DataFrame, live_counts: DataFrame) -> DataFrame:
    """Full-outer align two (dim, bucket, n) tables into
    (dim, bucket, n_a, n_b) with zero fill — O(buckets) work."""
    ref = ref_counts.select("dim", "bucket", F.col("n").cast("long").alias("n_a"))
    live = live_counts.select("dim", "bucket", F.col("n").cast("long").alias("n_b"))
    return ref.join(live, ["dim", "bucket"], "full_outer").select(
        "dim",
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )


def drift_metrics(
    ref_counts: DataFrame,
    live_counts: DataFrame,
    ordered_dims: list[str] | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-dimension drift summary from two (dim, bucket, n) count tables:
    (dim, psi, jsd, ks) — the three standard drift statistics from ONE
    bucket alignment.

    - psi: sum of the eps-clamped per-bucket PSI terms (psi_from_counts
      semantics, collapsed per dim).
    - jsd: Jensen-Shannon divergence in nats, 0.5*KL(a||m) + 0.5*KL(b||m)
      with m the midpoint mixture; zero-share buckets contribute 0 by the
      0*ln(0)=0 convention (no clamp needed — m > 0 wherever a bucket
      exists). Bounded by ln(2), symmetric, the better-behaved cousin of
      PSI when many buckets are empty on one side.
    - ks: Kolmogorov-Smirnov statistic max |CDF_a - CDF_b|, defined only
      for dims in `ordered_dims` (numeric dims whose buckets are bin
      indexes; buckets order by their integer value) — NULL otherwise.

    Everything is O(buckets): the KS window partitions by dim over a
    bins-sized table, never over rows.
    """
    ordered = list(ordered_dims or [])
    counts = _aligned_counts(ref_counts, live_counts)
    totals = counts.groupBy("dim").agg(
        F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
    )
    t = counts.join(F.broadcast(totals), "dim").select(
        "dim",
        "bucket",
        (F.col("n_a") / F.col("__ta")).alias("sa"),
        (F.col("n_b") / F.col("__tb")).alias("sb"),
    )
    ca = F.greatest(F.col("sa"), F.lit(float(eps)))
    cb = F.greatest(F.col("sb"), F.lit(float(eps)))
    m = (F.col("sa") + F.col("sb")) / 2
    kl = lambda s: F.when(  # noqa: E731
        F.col(s) > 0, F.col(s) * F.log(F.col(s) / m)
    ).otherwise(F.lit(0.0))
    # try_cast, not cast: categorical buckets share the window expression
    # and ANSI mode would throw on them (their KS is NULL-gated anyway)
    w = Window.partitionBy("dim").orderBy(F.col("bucket").try_cast("long"))
    t = t.select(
        "dim",
        ((ca - cb) * F.log(ca / cb)).alias("__psi"),
        (kl("sa") / 2 + kl("sb") / 2).alias("__jsd"),
        F.when(
            F.col("dim").isin(ordered) if ordered else F.lit(False),
            F.abs(F.sum("sa").over(w) - F.sum("sb").over(w)),
        ).alias("__ks"),
    )
    return t.groupBy("dim").agg(
        F.round(F.sum("__psi"), 6).alias("psi"),
        F.round(F.sum("__jsd"), 6).alias("jsd"),
        F.round(F.max("__ks"), 6).alias("ks"),
    )


def _psi_finish(counts: DataFrame, eps: float) -> DataFrame:
    """Totals + clamped-share PSI over a (dim, bucket, n_a, n_b) table —
    the single arithmetic tail every drift face ends in (the DuckDB
    oracle replays exactly these expressions)."""
    totals = counts.groupBy("dim").agg(
        F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
    )
    sa = F.greatest(F.col("n_a") / F.col("__ta"), F.lit(float(eps)))
    sb = F.greatest(F.col("n_b") / F.col("__tb"), F.lit(float(eps)))
    return counts.join(F.broadcast(totals), "dim").select(
        "dim",
        "bucket",
        "n_a",
        "n_b",
        F.round(F.col("n_a") / F.col("__ta"), 6).alias("share_a"),
        F.round(F.col("n_b") / F.col("__tb"), 6).alias("share_b"),
        F.round((sa - sb) * F.log(sa / sb), 6).alias("psi"),
    )


def drift_report(
    a: DataFrame,
    b: DataFrame,
    cat_cols: list[str] | None = None,
    num_cols: list[str] | None = None,
    bins: int = 10,
    eps: float = 1e-6,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Population Stability Index report between two snapshots of the same
    table (training corpus last week vs this week, reference vs serving
    window). One row per (dim, bucket): counts, shares and the bucket's PSI
    contribution; SUM(psi) per dim is the PSI (rule of thumb: < 0.1 stable,
    0.1-0.25 shifting, > 0.25 drifted).

    Categorical columns bucket by value (nulls -> "(null)"); numeric
    columns by `bins` equi-width bins over the GLOBAL [min, max] of BOTH
    snapshots (one tiny pre-aggregate; same closed-right-edge convention
    as equi_width_histogram), so bucket edges are identical on both sides
    by construction — or over explicit `bounds[col] = (lo, hi)` when a
    pipeline pins the range up front (required to compare against
    streaming_drift_cells, where no global min/max exists yet). Shares are clamped at `eps` before the log so
    empty-on-one-side buckets contribute a large finite term, the standard
    PSI convention. psi = (share_a - share_b) * ln(share_a / share_b).

    Scale: each dim is a map-side projection; everything unions into ONE
    long-form groupBy over (dim, bucket, snapshot) keys — cardinality is
    bins x dims, not rows — with partial aggregation map-side. Per-dim
    totals broadcast back onto the bucket table. No windows, no sort; the
    two inputs are scanned exactly once each.
    """
    cat_cols = cat_cols or []
    num_cols = num_cols or []
    if not cat_cols and not num_cols:
        raise ValueError("need at least one of cat_cols / num_cols")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    edges = _drift_edges(num_cols, bounds, [a, b])
    tag = lambda df, s: _drift_long_form(  # noqa: E731
        df, cat_cols, num_cols, bins, edges
    ).withColumn("__snap", F.lit(s))
    counts = (
        tag(a, "a").unionByName(tag(b, "b"))
        .groupBy("dim", "bucket")
        .agg(
            F.sum((F.col("__snap") == "a").cast("long")).alias("n_a"),
            F.sum((F.col("__snap") == "b").cast("long")).alias("n_b"),
        )
    )
    return _psi_finish(counts, eps)


def quantile_sketch_check(
    df: DataFrame,
    col: str,
    probs: list[float] | None = None,
    accuracy: int = 1000,
) -> DataFrame:
    """Exact quantiles + a VERIFIED rank-error certificate for the sketch path.

    At 100 TB the only viable quantile operator is a mergeable sketch —
    Spark's ``approx_percentile`` (Greenwald-Khanna summaries, rank error
    <= 1/accuracy). This check runs BOTH paths over the same column and
    certifies the sketch against its contract: for each probe p it emits

    - ``exact_q``: the type-7 exact quantile (``percentile`` — the value a
      correctness gate pins),
    - ``approx_rank_frac``: upper rank(approx value)/n = count(x <= v)/n
      (informational — see determinism note below), and
    - ``within_bound``: whether the sketch value's RANK INTERVAL
      [count(x < v)+1, count(x <= v)] intersects [p*n - eps*n, p*n + eps*n]
      (eps = 1/accuracy, plus one 1/n slack for the discrete rank step).
      The GK guarantee is that SOME rank of the returned value lies within
      eps*n of p*n; a value with multiplicity > eps*n (say, a column that
      is 50% zeros probed at p=0.25) owns a WIDE rank interval, and the
      upper rank alone can exceed the bound while the value still
      satisfies the contract — hence the two-sided interval test:
      ``lo/n - p <= eps + 1/n AND p - hi/n <= eps + 1/n``.

    exact_q and within_bound are deterministic: exact_q by definition;
    within_bound because the GK bound holds for ANY merge order — every
    value the sketch may legally return passes the interval test, so the
    verdict cannot flip with partitioning. The sketch value itself is NOT
    in the output, and ``approx_rank_frac`` is deterministic only up to
    the same rank interval (on duplicate-free columns it is exact) — a
    contract should pin (p, exact_q, within_bound) only.

    Shape: one pass for both aggregates (exact percentile is the expensive
    one — it sorts per group; the point of the row is that the CHEAP sketch
    provably stays within rank eps of it, so pipelines can drop the exact
    path at scale), plus one broadcast-joined rank recount of k probe
    values.
    """
    ps = [float(p) for p in (probs if probs is not None else [0.25, 0.5, 0.75, 0.9, 0.99])]
    if not ps or any(not 0.0 <= p <= 1.0 for p in ps):
        raise ValueError("probs must be fractions in [0, 1]")
    if accuracy < 10:
        raise ValueError("accuracy must be >= 10")
    vals = df.select(F.col(col).cast("double").alias("x")).where(F.col("x").isNotNull())
    # r14 OPT (guide §1.2 per-task work): the ARRAY forms of percentile /
    # approx_percentile build ONE value-count buffer and ONE GK summary
    # shared by every probe, instead of |probs| independent per-probe
    # aggregation buffers over the same column — identical exact_q values
    # (same algorithm per element) and the same GK rank guarantee, which is
    # all within_bound asserts
    plist = ", ".join(repr(p) for p in ps)
    agg = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"percentile(x, array({plist}))").alias("__ex"),
        F.expr(f"approx_percentile(x, array({plist}), {int(accuracy)})").alias("__ap"),
    ).select(
        "n",
        *[F.element_at("__ex", i + 1).alias(f"ex_{i}") for i in range(len(ps))],
        *[F.element_at("__ap", i + 1).alias(f"ap_{i}") for i in range(len(ps))],
    )
    # broadcast the ONE-row aggregate back against the column and compute
    # every probe's true rank in a single conditional aggregate — no row
    # blow-up, one extra scan total
    joined = vals.crossJoin(F.broadcast(agg))
    ranks = joined.agg(
        F.max("n").alias("n"),
        *[F.max(f"ex_{i}").alias(f"ex_{i}") for i in range(len(ps))],
        *[
            F.sum((F.col("x") <= F.col(f"ap_{i}")).cast("long")).alias(f"hi_{i}")
            for i in range(len(ps))
        ],
        *[
            F.sum((F.col("x") < F.col(f"ap_{i}")).cast("long")).alias(f"lo_{i}")
            for i in range(len(ps))
        ],
    )
    eps = 1.0 / float(accuracy)
    slack = F.lit(eps) + F.lit(1.0) / F.col("n")
    per_probe = ranks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"),
                        F.round(F.col(f"ex_{i}"), 6).alias("exact_q"),
                        F.round(F.col(f"hi_{i}") / F.col("n"), 6).alias("approx_rank_frac"),
                        # interval test: the value's rank span [lo+1, hi]
                        # must intersect [p*n - eps*n, p*n + eps*n]
                        (
                            (F.col(f"lo_{i}") / F.col("n") - F.lit(p) <= slack)
                            & (F.lit(p) - F.col(f"hi_{i}") / F.col("n") <= slack)
                        ).alias("within_bound"),
                    )
                    for i, p in enumerate(ps)
                ]
            )
        ).alias("q")
    ).select("q.*")
    return per_probe.orderBy("p")


def topk_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-k keys per group by count (or by summed ``weight_col``) —
    "top tokens per source", "top events per user segment".

    Returns (group_col, key_col, n, rank), rank 1..k per group with the
    deterministic (n DESC, key ASC) tie-break shared with heavy_hitters.

    Scale shape: aggregate FIRST (one keyed groupBy on (group, key) with
    map-side partial aggregation), window SECOND — the row_number
    partition sees only each group's DISTINCT keys, not its raw rows, so
    a billion-row group with a million distinct keys windows over the
    million. For a group whose distinct-key count itself is enormous,
    compose mg_summaries per group upstream to bound the candidates; this
    operator is the exact face.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    measure = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.coalesce(F.col(weight_col).cast("long"), F.lit(0)))
    )
    counts = df.groupBy(F.col(group_col), F.col(key_col)).agg(measure.alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col(key_col).asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: str | None = None,
) -> DataFrame:
    """Exact tie-aware ROC AUC of a score against a binary label — the
    Mann-Whitney rank statistic, the standard acceptance gate for a
    model-based quality filter (does the classifier actually rank kept
    documents above dropped ones?).

    AUC = P(score_pos > score_neg) + P(score_pos == score_neg) / 2 over all
    (positive, negative) pairs — computed WITHOUT enumerating pairs and
    WITHOUT a global row sort:

    1. one groupBy on the (group,) distinct score — per score cell:
       n_pos, n_neg (map-side combine; cells = |distinct scores|, not rows);
    2. exclusive running negatives below each score via
       ``scan.grouped_prev_cumsum`` ordered by score — range-partitioned,
       so a million-cell score table still never serializes through one
       window task;
    3. one closing groupBy:  2U = sum(2 * n_pos_s * cum_neg_below_s
       + n_pos_s * n_neg_s)  — an INT64-exact pair count (every tied pair
       counted once, worth 1 in 2U units), divided once at the end:
       auc = 2U / (2 * N_pos * N_neg).

    The single final division of two exact integers makes the value
    bit-reproducible across engines and partitionings (the driver-contract
    requirement). 2U stays exact while total (pos x neg) pairs < 2^62 —
    beyond ~10^9 rows per side, bucket scores first (histogram_quantiles
    bins) and accept the binned AUC.

    Rows with a NULL score or NULL label are dropped (they rank nowhere).
    Returns one row per group — (by?, auc, n_pos, n_neg); auc is NULL when
    a group has no positives or no negatives (undefined, not 0).

    ``by`` runs per-group AUCs (per language, per source) in the same two
    aggregation passes — cells key on (by, score) and the scan's group key
    is ``by`` itself.
    """
    from . import scan

    label = F.col(label_col).cast("boolean")
    scored = df.where(
        F.col(score_col).isNotNull() & label.isNotNull()
    ).select(
        (F.col(by) if by is not None else F.lit(0)).alias("__g"),
        F.col(score_col).cast("double").alias("__s"),
        label.cast("long").alias("__y"),
    )
    cells = scored.groupBy("__g", "__s").agg(
        F.sum("__y").alias("__np"),
        (F.count(F.lit(1)) - F.sum("__y")).alias("__nn"),
    )
    cum = scan.grouped_prev_cumsum(
        cells, "__g", [F.col("__s").asc()], F.col("__nn"), "__cum_nn"
    )
    out = cum.groupBy("__g").agg(
        F.sum(
            F.lit(2) * F.col("__np") * F.col("__cum_nn")
            + F.col("__np") * F.col("__nn")
        ).alias("__u2"),
        F.sum("__np").alias("n_pos"),
        F.sum("__nn").alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__u2").cast("double")
        / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
    )
    cols = ([F.col("__g").alias(by)] if by is not None else []) + [
        auc.alias("auc"),
        F.col("n_pos"),
        F.col("n_neg"),
    ]
    return out.select(*cols)


def roc_points(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """The ROC CURVE behind ``binary_auc``'s scalar: one point per distinct
    score threshold t — (threshold, n_pos_ge, n_neg_ge, tpr, fpr), where
    tpr = P(score >= t | pos) and fpr = P(score >= t | neg). Classifying
    "keep documents scoring >= t" at every observable operating point —
    the curve a quality-filter threshold is actually chosen from.

    Same distributed shape as binary_auc: one groupBy to per-score cells,
    one ``scan.grouped_prev_cumsum`` ordered by score DESCENDING (so the
    exclusive cumulative + the cell's own count = the >= t tally), and the
    ratios are single divisions of exact int64 tallies — engine- and
    partitioning-stable. Rows with NULL score or label are dropped.
    Returns one row per distinct score, NULL tpr/fpr when the class is
    empty (undefined, not 0).
    """
    from . import scan

    label = F.col(label_col).cast("boolean")
    scored = df.where(
        F.col(score_col).isNotNull() & label.isNotNull()
    ).select(
        F.lit(0).alias("__g"),
        F.col(score_col).cast("double").alias("threshold"),
        label.cast("long").alias("__y"),
    )
    cells = scored.groupBy("__g", "threshold").agg(
        F.sum("__y").alias("__np"),
        (F.count(F.lit(1)) - F.sum("__y")).alias("__nn"),
    )
    # r14 OPT (guide §2.4/§5): both >=-threshold tallies ride ONE ranged
    # prefix-scan pass (identical per-value arithmetic), and the class
    # totals aggregate the checkpointed scan output instead of re-running
    # the cells subtree (whose input is a full corpus-scoring scan).
    cum = scan.grouped_prev_cumsum_multi(
        cells,
        "__g",
        [F.col("threshold").desc()],
        [(F.col("__np"), "__cum_np"), (F.col("__nn"), "__cum_nn")],
    )
    tot = cum.groupBy("__g").agg(
        F.sum("__np").alias("__P"), F.sum("__nn").alias("__N")
    )
    out = cum.join(F.broadcast(tot), "__g")
    n_pos_ge = (F.col("__cum_np") + F.col("__np")).cast("long")
    n_neg_ge = (F.col("__cum_nn") + F.col("__nn")).cast("long")
    return out.select(
        F.col("threshold"),
        n_pos_ge.alias("n_pos_ge"),
        n_neg_ge.alias("n_neg_ge"),
        F.when(F.col("__P") > 0, n_pos_ge.cast("double") / F.col("__P")).alias("tpr"),
        F.when(F.col("__N") > 0, n_neg_ge.cast("double") / F.col("__N")).alias("fpr"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    by: str | None = None,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: does a
    document scored 0.8 actually belong to the positive class ~80% of the
    time? The companion to ``binary_auc`` (ranking) and ``roc_points``
    (operating points) — calibration is the third axis a model-based
    quality filter is judged on, and the per-bin table is what an
    expected-calibration-error (ECE) or a reliability plot consumes.

    Scores are bucketed into ``bins`` equal-width bins over [0, 1] (score
    1.0 folds into the last bin); per bin (optionally per ``by`` group):
    ``n``, ``n_pos`` (exact int64 tallies), ``pos_rate = n_pos / n`` (one
    division of exact integers), and ``mean_score`` (the bin's average
    predicted probability — for dyadic-rational scores like the
    quality_score's k/4 grid the partial sums are EXACT so the value is
    partitioning-independent; for arbitrary float scores it is
    deterministic to the usual last-ulp summation-order caveat). NULL
    scores/labels are dropped; scores outside [0, 1] raise — calibration
    is only defined for probability-scaled scores.

    ECE = sum_b (n_b / N) * |pos_rate_b - mean_score_b| falls out of this
    table with one more tiny aggregation (``ece_from_bins``).

    Scale shape: ONE groupBy on (by?, bin) — at most ``groups x bins``
    cells, map-side combinable; no sort, no window, no pair work.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    score = F.col(score_col).cast("double")
    label = F.col(label_col).cast("boolean")
    clean = df.where(score.isNotNull() & label.isNotNull())
    oob = clean.where((score < 0.0) | (score > 1.0)).limit(1).count()
    if oob:
        raise ValueError(
            f"calibration_bins: {score_col} has values outside [0, 1]; "
            "scale scores to probabilities first"
        )
    b = F.least(F.floor(score * bins), F.lit(bins - 1)).cast("long").alias("bin")
    keys = ([by] if by else []) + [b]
    out = clean.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(label.cast("long")).cast("long").alias("n_pos"),
        F.sum(score).alias("__sum_score"),
    )
    return out.select(
        *([by] if by else []),
        "bin",
        "n",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
        (F.col("__sum_score") / F.col("n")).alias("mean_score"),
    )


def ece_from_bins(bin_table: DataFrame, by: str | None = None) -> DataFrame:
    """Expected calibration error from a ``calibration_bins`` table:
    ECE = sum_b (n_b / N) * |pos_rate_b - mean_score_b| (one tiny
    aggregation over at most groups x bins rows)."""
    # constant-key equi-join (not a cross join) keeps the no-cartesian
    # plan-audit invariant even in the global (by=None) case
    keys = [by] if by else ["__g"]
    base = bin_table if by else bin_table.withColumn("__g", F.lit(0))
    tot = base.groupBy(*keys).agg(F.sum("n").alias("__N"))
    j = base.join(F.broadcast(tot), keys)
    contrib = (
        F.col("n").cast("double")
        / F.col("__N")
        * F.abs(F.col("pos_rate") - F.col("mean_score"))
    )
    return j.groupBy(*keys).agg(F.sum(contrib).alias("ece")).drop("__g")
