"""Distinct-count sketches: HyperLogLog over xxhash64 (net-new scale surface).

The cardinality primitive every 100 TB pipeline needs (distinct users,
distinct n-grams, distinct URLs) where exact COUNT(DISTINCT) would shuffle
the full key set. Spark ships approx_count_distinct, but its sketch is
opaque; this HLL is built from first principles on `F.xxhash64` so that

- the REGISTERS are a queryable DataFrame (mergeable across corpora/days by
  a further groupBy-max — union of sketches IS max of registers), and
- the whole pipeline is bit-exactly oracle-checkable: the round-6 XXH64
  SQL transliteration (functions/xxh64_sql.py) lets DuckDB recompute the
  identical registers, something impossible for an opaque sketch.

Algorithm (Flajolet et al. 2007 HyperLogLog, 64-bit-hash variant):
p index bits -> m = 2^p registers; for each value, register = top p bits of
the unsigned hash, rho = 1 + leading-zero count of the remaining 64-p bits
(computed EXACTLY via length(bin(w)) — integer string length, no float
log2 edge cases); register keeps the max rho. Estimate = alpha_m * m^2 /
sum(2^-M_j) with the classic linear-counting small-range correction
(E <= 2.5m and empty registers present). No large-range correction: with
64-bit hashes collisions are negligible at any practical cardinality.

Scale shape: ONE groupBy on the register index (max m = 2^p keys, partial
max map-side) + one m-row final aggregate. Nothing else shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_count_distinct", "hll_alpha", "cms_table", "cms_estimate", "bloom_build", "bloom_maybe_contains", "hll_count_distinct_by", "hll_union_estimate", "hll_intersection_estimate", "mg_summaries", "heavy_hitters", "heavy_hitters_verify"]


def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m (Flajolet et al. 2007, Fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _rho_expr(h, p: int):
    """rho = 1 + leading zeros of the low (64-p) bits of unsigned hash h.

    w = h & (2^(64-p) - 1); its bit length is length(bin(w)) EXCEPT w=0,
    where bin() is "0" (length 1). Integer-exact: no log2 on doubles."""
    w = F.shiftleft(h, p)  # drop the p index bits; low bits fill with 0
    w = F.shiftrightunsigned(w, p)  # back in place: pure low-(64-p) field
    blen = F.length(F.bin(w))
    return (
        F.when(w == 0, F.lit(64 - p + 1))
        .otherwise(F.lit(64 - p) - blen + F.lit(1))
        .cast("int")
    )


def hll_registers(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """The full m-row register table (register long, rho int), rho = 0 for
    registers no value hashed into. Mergeable: union two corpora's tables
    and groupBy(register).max(rho) — that IS the sketch union."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    h = F.xxhash64(F.col(col))
    idx = F.shiftrightunsigned(h, 64 - p).alias("register")
    occupied = (
        df.select(idx, _rho_expr(h, p).alias("__rho"))
        .groupBy("register")
        .agg(F.max("__rho").alias("rho"))
    )
    spine = df.sparkSession.range(m).select(F.col("id").alias("register"))
    return (
        spine.join(occupied, "register", "left")
        .select("register", F.coalesce("rho", F.lit(0)).cast("int").alias("rho"))
    )


def hll_count_distinct(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """One-row estimate frame (m, zeros, estimate). estimate rounded to 4dp
    so the DuckDB oracle (same formula over the same bit-exact registers)
    hash-matches despite ln/pow last-ulp differences across engines."""
    m = 1 << p
    alpha = hll_alpha(m)
    regs = hll_registers(df, col, p)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
        F.sum((F.col("rho") == 0).cast("long")).alias("zeros"),
    )
    raw = F.lit(alpha * m * m) / F.col("__s")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros"))
    est = F.when((raw <= 2.5 * m) & (F.col("zeros") > 0), linear).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.col("zeros"),
        F.round(est, 4).alias("estimate"),
    )


def _cms_cells_expr(col: str, w: int, d: int):
    """Array of (row, col) structs for a value's d count-min cells —
    shared by the batch table, the probe side, and the streaming face."""
    if w & (w - 1) != 0 or w < 2:
        raise ValueError("w must be a power of two >= 2")
    if not 1 <= d <= 16:
        raise ValueError("d must be in [1, 16]")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.xxhash64(F.concat(F.lit(f"r{i}:"), F.col(col).cast("string")))
                .bitwiseAND(F.lit(w - 1))
                .alias("col"),
            )
            for i in range(d)
        ]
    )


def cms_table(df: DataFrame, col: str, w: int = 1024, d: int = 4) -> DataFrame:
    """Count-min sketch table (row, col, cnt) — the heavy-hitter frequency
    primitive (Cormode & Muthukrishnan 2005). Each value increments one
    cell per hash row; estimates (cms_estimate) take the min over rows, so
    they only ever OVERcount (by <= eN/w with probability 1 - (1/2)^d).

    Hash row i uses xxhash64 of "r{i}:" || value — the same engine-portable
    string-prefix trick as the md5 samplers, so the round-6 XXH64 SQL
    transliteration can recompute every cell and the driver hash-checks
    the sketch's INTERNAL STATE, not just its estimates. ``w`` must be a
    power of two: the column index is hash & (w-1), which is sign-safe on
    Spark's signed int64 hash and equals the unsigned mod.

    Scale: d map-side projections explode to (row, col) keys, ONE groupBy
    over <= d*w cells with partial map-side counts. Mergeable: union two
    tables and re-sum — sketch union IS cell-wise addition.
    """
    cells = _cms_cells_expr(col, w, d)
    return (
        df.select(F.explode(cells).alias("__c"))
        .select(F.col("__c.row").alias("row"), F.col("__c.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Point-frequency estimates for each probe value: (value, estimate) =
    min over hash rows of the matching cell counts (missing cell = 0).
    ``w``/``d`` must match the sketch's build parameters. The probe side is
    the small one — its hashed cells broadcast against the sketch table."""
    cells = _cms_cells_expr(col, w, d)
    pcells = (
        probes.select(F.col(col).alias("value"), F.explode(cells).alias("__c"))
        .select("value", F.col("__c.row").alias("row"), F.col("__c.col").alias("col"))
    )
    return (
        pcells.join(cms, ["row", "col"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("estimate"))
    )


def _bloom_cells(col: str, m_bits: int, k: int):
    """Array of (word, mask) structs for a value's k bloom positions.
    pos_i = xxhash64('b{i}:' || value) & (m_bits - 1); word = pos >> 6,
    mask = 1 << (pos & 63) as a signed-long BIT PATTERN (bit 63 wraps to
    Long.MIN — still the right pattern under bit_or)."""
    cells = []
    for i in range(k):
        pos = F.xxhash64(F.concat(F.lit(f"b{i}:"), F.col(col).cast("string"))).bitwiseAND(
            F.lit(m_bits - 1)
        )
        bit = pos.bitwiseAND(F.lit(63))
        # F.shiftleft takes a literal shift count, so build the mask as
        # 2^bit — powers of two through 2^62 are exact doubles; bit 63
        # wraps to Long.MIN explicitly
        mask = (
            F.when(bit == 63, F.lit(-(1 << 63)).cast("long"))
            .otherwise(F.pow(F.lit(2.0), bit).cast("long"))
        )
        cells.append(
            F.struct(F.shiftright(pos, 6).alias("word"), mask.alias("mask"))
        )
    return F.array(*cells)


def bloom_build(df: DataFrame, col: str, m_bits: int = 4096, k: int = 3) -> DataFrame:
    """Bloom filter as a (word, bits) table — 64 filter bits per row, only
    occupied words materialized. The join-pruning primitive: build on the
    small side's keys, semi-join the 100 TB side against the (tiny,
    broadcastable) word table and drop rows whose bits are absent before
    the real shuffle. No false negatives; false positives ~ (1-e^{-kn/m})^k.

    Same engine-portable prefix-seeded xxhash64 as the count-min sketch,
    so the oracle (XXH64 SQL transliteration) rebuilds every word's bit
    pattern exactly. Mergeable: union two tables and bit_or per word.
    Scale: one groupBy over <= m/64 words with map-side partial bit_or.
    """
    if m_bits & (m_bits - 1) != 0 or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    return (
        df.select(F.explode(_bloom_cells(col, m_bits, k)).alias("__c"))
        .select(F.col("__c.word").alias("word"), F.col("__c.mask").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_maybe_contains(
    bloom: DataFrame, probes: DataFrame, col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """(value, maybe_present) per probe: true iff ALL k bloom bits are set.
    ``m_bits``/``k`` must match the build. The bloom table is the small
    side — broadcast it against the probe stream."""
    if m_bits & (m_bits - 1) != 0 or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    pc = (
        probes.select(F.col(col).alias("value"), F.explode(_bloom_cells(col, m_bits, k)).alias("__c"))
        .select("value", F.col("__c.word").alias("word"), F.col("__c.mask").alias("mask"))
    )
    hit = pc.join(F.broadcast(bloom), "word", "left").select(
        "value",
        (F.coalesce("bits", F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask")).alias("__hit"),
    )
    return hit.groupBy("value").agg(
        (F.sum(F.when(F.col("__hit"), 0).otherwise(1)) == 0).alias("maybe_present")
    )


def hll_count_distinct_by(
    df: DataFrame, key_col: str, col: str, p: int = 8
) -> DataFrame:
    """Per-group HLL cardinality: (key, zeros, estimate) — distinct users
    per segment / distinct n-grams per source, with one sketch per key.
    One groupBy on (key, register) with map-side partial max (state
    <= 2^p per key), then a per-key m-row rollup — no per-key exact
    distinct shuffle. Same register math the driver hash-checks
    cross-engine (hll_registers); estimate rounded 4dp like the global
    form so ln/pow ulp differences can't flip the hash."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    alpha = hll_alpha(m)
    h = F.xxhash64(F.col(col))
    occupied = (
        df.select(
            F.col(key_col).alias("key"),
            F.shiftrightunsigned(h, 64 - p).alias("register"),
            _rho_expr(h, p).alias("__rho"),
        )
        .groupBy("key", "register")
        .agg(F.max("__rho").alias("rho"))
    )
    agg = occupied.groupBy("key").agg(
        # absent registers contribute 2^0 = 1 each to the harmonic sum
        (F.sum(F.pow(F.lit(2.0), -F.col("rho"))) + (m - F.count(F.lit(1)))).alias("__s"),
        (F.lit(m) - F.count(F.lit(1))).alias("zeros"),
    )
    raw = F.lit(alpha * m * m) / F.col("__s")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros"))
    est = F.when((raw <= 2.5 * m) & (F.col("zeros") > 0), linear).otherwise(raw)
    return agg.select("key", F.col("zeros").cast("long").alias("zeros"), F.round(est, 4).alias("estimate"))


def hll_union_estimate(regs_a: DataFrame, regs_b: DataFrame, p: int = 8) -> DataFrame:
    """Cardinality of A ∪ B from two register tables alone (no data
    re-scan): merge by register-wise max, then the standard estimator.
    This is the sketch algebra that lets per-day / per-corpus sketches
    roll up without touching the raw keys again."""
    m = 1 << p
    alpha = hll_alpha(m)
    merged = (
        regs_a.unionByName(regs_b)
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )
    agg = merged.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
        F.sum((F.col("rho") == 0).cast("long")).alias("zeros"),
    )
    raw = F.lit(alpha * m * m) / F.col("__s")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros"))
    est = F.when((raw <= 2.5 * m) & (F.col("zeros") > 0), linear).otherwise(raw)
    return agg.select(F.round(est, 4).alias("union_estimate"))


def hll_intersection_estimate(
    df_a: DataFrame, df_b: DataFrame, col: str, p: int = 8
) -> DataFrame:
    """|A ∩ B| by inclusion-exclusion over three HLL estimates:
    est(A) + est(B) - est(A ∪ B), floored at 0. The union comes from
    register-wise max of the two sketches (hll_union_estimate), so the
    raw keys are scanned once per side and never shuffled. Error grows
    with |A ∪ B| / |A ∩ B| — the documented HLL intersection caveat; use
    MinHash Jaccard (dedup.py) when the intersection is small."""
    ra, rb = hll_registers(df_a, col, p), hll_registers(df_b, col, p)
    ea = hll_count_distinct(df_a, col, p).select(F.col("estimate").alias("ea"))
    eb = hll_count_distinct(df_b, col, p).select(F.col("estimate").alias("eb"))
    eu = hll_union_estimate(ra, rb, p)
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            F.round(
                F.greatest(F.col("ea") + F.col("eb") - F.col("union_estimate"), F.lit(0.0)), 4
            ).alias("intersection_estimate")
        )
    )


def mg_summaries(
    df: DataFrame, col: str, capacity: int = 4096, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (pass 1 of heavy_hitters).

    Misra & Gries 1982 (batched "frequent" algorithm): each partition keeps
    at most ``capacity`` counters; when a batch merge overflows, every
    counter is decremented by the smallest value delta that evicts the
    overflow, and the partition accumulates ``delta_total`` — an EXACT
    upper bound on how much any evicted key was undercounted locally.

    Output rows: (key, mg_est) for surviving keys, plus ONE sentinel row
    per partition with key=NULL and mg_est=delta_total. The union of
    surviving keys across partitions is a guaranteed superset of every key
    whose global count exceeds sum(delta_total) — by averaging, a key that
    heavy must survive in at least one partition's summary.

    Scale shape: one Arrow-batched pass over the raw column; output is
    bounded by partitions x (capacity+1) rows regardless of input size —
    the point of the sketch: a corpus with billions of distinct tokens
    never shuffles its full key set.

    ``weight_col`` (int64, non-negative) switches counts to weighted sums
    (e.g. top sources by TOKEN volume, not document count). The Misra-Gries
    bound argument is count-agnostic — a weighted increment is just that
    many unit increments arriving together — so the eviction-total bound
    and the provability guard carry over unchanged. Integer weights only:
    a float weight would put rounding error inside an EXACTNESS proof.
    Null weights count as zero; negative weights raise in-plan.
    """
    cap = int(capacity)
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    if weight_col is None:
        src = df.select(F.col(col).cast("string").alias("key"))
    else:
        wtype = df.schema[weight_col].dataType.simpleString()
        if wtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col must be an integer column (exactness proof), got {wtype}"
            )
        w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
        src = df.select(
            F.col(col).cast("string").alias("key"),
            F.when(w >= 0, w)
            .otherwise(F.raise_error(F.lit("mg_summaries: negative weight")))
            .alias("w"),
        )

    def run(batches):
        import numpy as np
        import pandas as pd

        d: dict = {}
        delta_total = 0
        for pdf in batches:
            if weight_col is not None:
                vc = pdf.dropna(subset=["key"]).groupby("key", sort=False)["w"].sum()
            else:
                vc = pdf["key"].dropna().value_counts()
            for key, c in vc.items():
                d[key] = d.get(key, 0) + int(c)
            if len(d) > cap:
                drop = len(d) - cap
                vals = np.fromiter(d.values(), dtype=np.int64, count=len(d))
                delta = int(np.partition(vals, drop - 1)[drop - 1])
                delta_total += delta
                d = {k2: v - delta for k2, v in d.items() if v > delta}
        yield pd.DataFrame(
            {
                "key": list(d.keys()) + [None],
                "mg_est": np.asarray(list(d.values()) + [delta_total], dtype=np.int64),
            }
        )

    return src.mapInPandas(run, schema="key string, mg_est long")


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
    weight_col: str | None = None,
    max_broadcast_candidates: int = 1_000_000,
) -> DataFrame:
    """EXACT top-k most frequent values of ``col`` without a full-key shuffle.

    The two-pass sketch-then-verify pattern for 100 TB key spaces:
      pass 1  mg_summaries — per-partition Misra-Gries candidate superset
              (bounded at partitions x capacity rows; the billions-of-
              distinct-tokens groupBy never happens);
      pass 2  exact counts for ONLY the candidate keys (broadcast semi-join
              pushes the candidate filter into the scan) and a distributed
              TakeOrdered top-k with a deterministic (count desc, key asc)
              tie-break.

    The result is PROVABLY exact, not approximate: any non-candidate key's
    true count is at most U = sum of per-partition decrement totals, and the
    plan raises an error unless the k-th exact candidate count exceeds U —
    so no non-candidate could displace the returned rows. When FEWER than k
    candidates survive at all, a rank spine forces the same decision: with
    U = 0 the candidate set is provably the complete key set (no eviction
    ever fired) and the short result is the true, short top-k; with U > 0
    the missing ranks are unprovable and the plan raises. On failure, raise
    ``capacity`` (U shrinks as ~N/capacity).

    Returns (key, n_exact) — exact counts (or exact weighted sums when
    ``weight_col`` is given; see mg_summaries), hash-contractable against a
    plain GROUP BY / ORDER BY / LIMIT oracle.

    The candidate set is bounded at partitions x capacity distinct keys —
    comfortably broadcastable at any realistic setting — but the bound is
    made UNCONDITIONAL by ``max_broadcast_candidates``: past that many
    pass-1 survivors (e.g. 10k partitions x capacity 4096 ~ 40M keys) the
    exact recount falls back to a shuffle hash join, bit-identical output
    (equality asserted in tests via a tiny threshold override).
    """
    # bounded (partitions x capacity); materialize once so the candidate
    # branch and the U-bound branch don't each rescan the raw corpus
    pass1 = mg_summaries(df, col, capacity, weight_col=weight_col).localCheckpoint()
    cands = pass1.where(F.col("key").isNotNull()).select("key").distinct()
    ubound = pass1.where(F.col("key").isNull()).agg(
        F.coalesce(F.sum("mg_est"), F.lit(0)).alias("u_bound")
    )
    return heavy_hitters_verify(
        df,
        col,
        cands,
        ubound,
        k=k,
        weight_col=weight_col,
        max_broadcast_candidates=max_broadcast_candidates,
    )


def heavy_hitters_verify(
    df: DataFrame,
    col: str,
    candidates: DataFrame,
    u_bound: DataFrame | int,
    k: int = 20,
    weight_col: str | None = None,
    max_broadcast_candidates: int = 1_000_000,
) -> DataFrame:
    """Pass 2 of ``heavy_hitters`` over an EXTERNAL candidate set: exact
    recount of the candidates, deterministic top-k, and the same
    provability guard.

    ``candidates`` is any DataFrame with a string ``key`` column whose keys
    form a superset of every key heavier than ``u_bound`` — the batch
    pass-1 (mg_summaries) or the streaming face
    (``streaming.events.streaming_mg_candidates``; its docstring's
    union-of-snapshots + final-delta_total recipe produces exactly this
    pair). A SUPERSET is always safe: extra candidates cost recount work,
    never correctness. ``u_bound`` is the summed eviction total — an int,
    or a one-row DataFrame with a ``u_bound`` long column.

    The recount join broadcasts the candidate set when it is provably
    small, else falls back to a shuffle hash join (identical output) —
    see ``max_broadcast_candidates`` on heavy_hitters.
    """
    from pyspark.sql.functions import broadcast

    spark = df.sparkSession
    if isinstance(u_bound, int):
        ubound = spark.createDataFrame([(int(u_bound),)], "u_bound long")
    else:
        ubound = u_bound
    cands = candidates.select(F.col("key").cast("string").alias("key")).where(
        F.col("key").isNotNull()
    )
    measure = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.coalesce(F.col("w"), F.lit(0)))
    )
    proj = [F.col(col).cast("string").alias("key")]
    if weight_col is not None:
        # same validation mg_summaries enforces in the fused path: external
        # candidate sets must not smuggle float or negative weights into an
        # EXACTNESS proof (null weights count as zero, as in pass 1)
        wtype = df.schema[weight_col].dataType.simpleString()
        if wtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col must be an integer column (exactness proof), got {wtype}"
            )
        w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
        proj.append(
            F.when(w >= 0, w)
            .otherwise(F.raise_error(F.lit("heavy_hitters_verify: negative weight")))
            .alias("w")
        )
    # broadcast-size guard: the candidate count is cheap (candidates is the
    # bounded pass-1 output / a driver-built frame, never the raw corpus);
    # past the threshold use a plain shuffle hash join — same rows out
    cand_side = (
        broadcast(cands) if cands.count() <= int(max_broadcast_candidates) else cands
    )
    exact = (
        df.select(*proj)
        .join(cand_side, "key")
        .groupBy("key")
        .agg(measure.alias("n_exact"))
    )
    topk = exact.orderBy(F.col("n_exact").desc(), F.col("key").asc()).limit(k)
    # rank spine: k expected ranks left-joined against the (<= k-row) result.
    # The row_number window runs AFTER limit(k) — k rows, one tiny task, not
    # a global sort (this is the source of Spark's "WindowExec: No Partition
    # Defined" log warning: cosmetic here, the windowed relation is <= k
    # rows by construction). A missing rank (null key) is fine iff U == 0 (candidate
    # set provably complete => the data simply has < k distinct keys);
    # otherwise it is exactly the silent-truncation case the guard exists
    # for, and the plan must raise rather than return an incomplete top-k.
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_exact").desc(), F.col("key").asc())
    ranked = topk.withColumn("__rank", F.row_number().over(w))
    spine = df.sparkSession.range(1, int(k) + 1).select(F.col("id").cast("int").alias("__rank"))
    full = (
        spine.join(ranked, "__rank", "left")
        .crossJoin(broadcast(ubound))
        .where(F.col("key").isNotNull() | (F.col("u_bound") > 0))
    )
    return full.select(
        F.when(F.col("key").isNotNull(), F.col("key"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("heavy_hitters: no candidate survived for rank "),
                    F.col("__rank").cast("string"),
                    F.lit(" (eviction bound "),
                    F.col("u_bound").cast("string"),
                    F.lit(" > 0) — increase capacity"),
                )
            )
        )
        .alias("key"),
        F.when(F.col("n_exact") > F.col("u_bound"), F.col("n_exact"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("heavy_hitters: rank-k count "),
                    F.col("n_exact").cast("string"),
                    F.lit(" not provably exact (eviction bound "),
                    F.col("u_bound").cast("string"),
                    F.lit(") — increase capacity"),
                )
            )
        )
        .alias("n_exact"),
    )
