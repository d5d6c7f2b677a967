"""Deterministic corpus sampling (net-new scale surface).

Training pipelines need reproducible subsamples whose membership does not
depend on partitioning, cluster size, or execution order. Both modes key
off an md5-derived uniform — `u(id) = int(md5("s{seed}:" + id)[:8], 16) /
2^32` — which Spark and DuckDB (and any engine with md5) reproduce
bit-for-bit, so sampled memberships are oracle-checkable and stable across
reruns and engines.

- ``deterministic_sample``: keep rows with u < fraction. A stateless
  map-side filter — no shuffle, no state, the 100 TB shape.
- ``stratified_sample``: exactly n rows per stratum, the n smallest by
  (u, id). Ranking goes through scan.grouped_dense_rank (range partition +
  per-cell offsets), so a handful of huge strata do not serialize through
  one task each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scan import grouped_dense_rank

__all__ = [
    "md5_uniform",
    "deterministic_sample",
    "weighted_sample",
    "stratified_sample",
    "mix_corpora",
    "split_corpus",
    "priority_sample",
    "temperature_mixture_rates",
    "temperature_mixture",
    "water_fill_rates",
    "epoch_repeat",
]


def md5_uniform(id_col: str, seed: int = 42) -> Column:
    """U[0,1) from the row id: int(md5("s{seed}:"+id)[:8], 16) / 2^32."""
    hexpart = F.substring(
        F.md5(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string"))), 1, 8
    )
    return F.conv(hexpart, 16, 10).cast("long") / F.lit(float(1 << 32))


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep rows whose deterministic uniform falls below ``fraction``."""
    return df.filter(md5_uniform(id_col, seed) < float(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: the n smallest by
    (uniform, id). The sort key is the md5 hex prefix concatenated with the
    zero-padded id — one string column, totally ordered, tie-free — ranked
    by the distributed grouped_dense_rank primitive.
    """
    key = F.concat(
        F.substring(
            F.md5(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        F.lpad(F.col(id_col).cast("string"), 18, "0"),
    )
    ranked = grouped_dense_rank(
        df.withColumn("__sk", key), strata_col, "__sk", "__srank"
    )
    return ranked.filter(F.col("__srank") < int(n_per_stratum)).drop("__sk", "__srank")


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint splits (train/val/test): every row tagged with
    the name of the fraction band its uniform falls in.

    Bands are cumulative in the dict's insertion order —
    ``{"train": .9, "val": .05, "test": .05}`` maps u<0.9 -> train,
    u<0.95 -> val, else test. Fractions must sum to 1 (±1e-9): unlike
    sampling, a split must place EVERY row. Membership is a pure function
    of (seed, id): stable across reruns, partitionings and engines, and a
    row can never land in two splits — the leakage guarantee train/test
    splits exist for. Stateless map-side expression, no shuffle.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions or any(w < 0 for w in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    u = md5_uniform(id_col, seed)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += float(fractions[name])
        branch = F.when(u < cum, F.lit(name))
        expr = branch if expr is None else expr.when(u < cum, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def mix_corpora(
    sources: list[tuple[DataFrame, float]],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic dataset mixture: for each (frame, weight) source, keep
    rows via ``deterministic_sample`` at that weight (seed offset per
    source) and union with a ``source_id`` tag. Membership is a pure
    function of (seed, source index, id) — rerun-, partition- and
    engine-stable — so mixtures are reproducible and each source's
    contribution is auditable. All sources must share a schema.
    """
    out = None
    for i, (df, w) in enumerate(sources):
        part = deterministic_sample(df, float(w), id_col=id_col, seed=seed + i).withColumn(
            "source_id", F.lit(i)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mix_corpora needs at least one source")
    return out


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted Bernoulli sampling: row i kept with probability
    min(1, fraction * w_i / mean(w)) — the quality-aware subsample every
    curation pipeline runs (upweight high-quality documents, keep the
    EXPECTED sample size at ~fraction * n). Membership is the same
    deterministic md5 uniform as deterministic_sample, so it is stable
    across engines, reruns and partitionings, and oracle-checkable.

    Scale shape: one tiny global aggregate for mean(w) (broadcast scalar
    via crossJoin of a 1-row frame), then a stateless map-side filter —
    no shuffle of the data itself.
    """
    if fraction < 0:
        raise ValueError("fraction must be >= 0")
    mw = df.agg(F.avg(F.col(weight_col).cast("double")).alias("__mw"))
    u = md5_uniform(id_col, seed)
    return (
        df.crossJoin(F.broadcast(mw))
        .filter(u < F.least(F.lit(1.0), F.lit(float(fraction)) * F.col(weight_col) / F.col("__mw")))
        .drop("__mw")
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each row gets priority ln(u)/w from its deterministic md5 uniform and
    the k LARGEST priorities win — equivalent in distribution to k
    sequential weighted draws without replacement.

    The third leg of the sampling family: `deterministic_sample` is
    Bernoulli (random size), `weighted_sample` is weighted Bernoulli
    (random size), this is EXACT-k weighted. Scale shape: priority is a
    stateless map-side expression and the selection is sort-limit, which
    Spark executes as TakeOrderedAndProject — per-partition top-k then a
    k-row merge on the driver, never a global sort (the skew_report
    pattern). Mergeable by construction: top-k of a union is the top-k of
    per-shard top-ks. Membership is a pure function of (seed, id, w) —
    rerun/partition/engine stable; the DuckDB oracle replays priority and
    selection exactly. Rows with w <= 0 or null are excluded (they can
    never win a weighted draw); u is clamped to 2^-33 so ln stays finite
    on both engines.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    u = F.greatest(md5_uniform(id_col, seed), F.lit(2.0 ** -33))
    pri = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(id_col))
        .limit(int(k))
        .withColumn("priority", F.round(F.col("__pri"), 6))
        .drop("__pri")
    )


def temperature_mixture_rates(
    docs: DataFrame,
    by_col: str = "lang",
    alpha: float = 0.3,
    total_fraction: float = 0.5,
) -> list[tuple]:
    """Per-group keep rates for a temperature-resampled mixture — the
    multilingual corpus-balancing rule (mT5 / XLM-R style): expected kept
    counts proportional to n_g^alpha, total expected kept mass
    ``total_fraction * N``, each rate capped at 1.

    alpha = 1 is a plain uniform subsample; alpha -> 0 equalizes groups
    (low-resource languages stop being drowned by the head). Uncapped, the
    rate is r_g = C * n_g^(alpha-1) with one global C; when a small group's
    implied rate exceeds 1 it SATURATES (keep all of it) and C re-solves
    over the rest — the standard water-filling iteration, <= |groups|
    rounds, driver-side over the |groups|-row count table (the corpus
    itself is never touched). Rates are rounded to 6 dp (the oracle-shared
    rounding; the SQL twin unrolls the same iteration).

    Returns [(group, n_docs, rate)] sorted by group — a tiny driver-side
    list, ready to broadcast.
    """
    counts = sorted(
        (
            (r[0], int(r[1]))
            for r in docs.groupBy(by_col).agg(F.count(F.lit(1)).alias("n")).collect()
            if r[0] is not None
        ),
        key=lambda gn: str(gn[0]),  # deterministic accumulation order
    )
    if not counts:
        raise ValueError(f"no non-null groups in {by_col!r}")
    return water_fill_rates(counts, alpha, total_fraction)


def water_fill_rates(
    counts: list[tuple], alpha: float, total_fraction: float
) -> list[tuple]:
    """Pure water-filling solver behind ``temperature_mixture_rates``:
    given [(group, n)], return [(group, n, rate)] with rate =
    min(1, C * n^(alpha-1)), C re-solved after each saturation round so
    sum(rate * n) == total_fraction * sum(n) whenever that target is
    feasible. Empty groups (n == 0) get rate 0 directly — they contribute
    no rows either way, and n^(alpha-1) is undefined at n=0 for alpha<1.
    Driver-side pure math (|groups| elements) — property-tested directly
    without Spark in the loop."""
    if not 0.0 < float(total_fraction) <= 1.0:
        raise ValueError("total_fraction must be in (0, 1]")
    if not float(alpha) > 0.0:
        raise ValueError("alpha must be > 0")
    a = float(alpha)
    counts = [(g, int(n)) for g, n in counts]
    if any(n < 0 for _, n in counts):
        raise ValueError("group counts must be >= 0")
    target = float(total_fraction) * float(sum(n for _, n in counts))
    sat: dict = {}
    C = 0.0
    while True:
        free = [(g, n) for g, n in counts if g not in sat and n > 0]
        if not free:
            break
        numer = target - float(sum(sat.values()))
        denom = float(sum(n ** a for _, n in free))
        C = numer / denom if denom > 0 and numer > 0 else 0.0
        newly = [(g, n) for g, n in free if C * n ** (a - 1.0) >= 1.0]
        if not newly:
            break
        sat.update(dict(newly))
    return [
        (
            g,
            n,
            0.0
            if n == 0
            else round(min(1.0, 1.0 if g in sat else C * n ** (a - 1.0)), 6),
        )
        for g, n in counts
    ]


def temperature_mixture(
    docs: DataFrame,
    by_col: str = "lang",
    alpha: float = 0.3,
    total_fraction: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-resampled corpus: keep each ``by_col`` group's rows at
    the ``temperature_mixture_rates`` water-filled rate, with the same
    deterministic md5-uniform membership as ``deterministic_sample`` — so
    the mixture is reproducible across reruns, partitionings and engines,
    and each group's realized contribution is auditable against its rate.

    Scale shape: one |groups|-row count aggregate, driver-side rate solve,
    a broadcast join of the rates and a stateless map-side filter — the
    corpus shuffles zero times. Rows with a NULL group are dropped (they
    have no rate). Schema passes through unchanged.
    """
    rates = temperature_mixture_rates(
        docs, by_col=by_col, alpha=alpha, total_fraction=total_fraction
    )
    spark = docs.sparkSession
    gtype = dict(docs.dtypes)[by_col]
    rates_df = spark.createDataFrame(
        [(g, r) for g, n, r in rates], f"`{by_col}` {gtype}, __rate double"
    )
    u = md5_uniform(id_col, seed)
    return (
        docs.join(F.broadcast(rates_df), by_col)
        .filter(u < F.col("__rate"))
        .select(*docs.columns)
    )


def epoch_repeat(
    df: DataFrame,
    rates: dict[str, float],
    by_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Materialize a FRACTIONAL-epoch data recipe: each ``by_col`` group g is
    repeated ``rates[g]`` times — "2.3 epochs of wikipedia, 0.5 of web" —
    as explicit (row, copy_idx) output rows a training loader can consume
    in one pass. Every row of group g yields floor(rate) full copies plus
    one more iff its deterministic uniform falls below frac(rate), so the
    realized group volume is rate * |g| in expectation with per-row
    reproducibility (the ``md5_uniform`` convention shared with
    deterministic_sample: same seed -> same extra-copy set on any engine
    or partitioning; raising frac(rate) only ever ADDS extra copies, and
    the floor copies are rate-independent). Groups missing from ``rates``
    get rate 1.0 (pass-through)
    — an upsampling recipe should not silently drop unlisted sources;
    rate 0 removes a group entirely.

    Output schema: input columns + ``copy_idx`` (0-based). Scale shape: a
    broadcast join of the |groups|-row rate table, one ``sequence()``
    explode per row (bounded by ceil(rate) — recipes are single-digit
    epochs), zero shuffles.
    """
    for g, r in rates.items():
        if not float(r) >= 0.0:
            raise ValueError(f"rate for group {g!r} must be >= 0, got {r}")
    spark = df.sparkSession
    gtype = dict(df.dtypes)[by_col]
    rate_df = spark.createDataFrame(
        [(g, float(r)) for g, r in rates.items()], f"{by_col} {gtype}, __rate double"
    )
    n_full = F.floor(F.coalesce(F.col("__rate"), F.lit(1.0))).cast("long")
    frac = F.coalesce(F.col("__rate"), F.lit(1.0)) - n_full
    extra = (md5_uniform(id_col, seed) < frac).cast("long")
    n_copies = (n_full + extra).cast("int")
    out_cols = df.columns + ["copy_idx"]
    return (
        df.join(F.broadcast(rate_df), by_col, "left")
        .withColumn("__nc", n_copies)
        .filter(F.col("__nc") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)))
        .select(*out_cols)
    )
