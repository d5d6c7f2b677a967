"""Similarity search over embedding columns (net-new scale surface).

- brute_force_topk: exact cosine top-k via self-join + window rank. The dot
  product is a JVM higher-order `aggregate` over zipped arrays — no Python in
  the loop. Correct baseline; O(n*m) comparisons.
- lsh_topk: random-hyperplane (sign-LSH) bucketed variant — the 100 TB path.
  Buckets shrink the candidate set by ~2^bits; recall is tunable via
  num_tables. Hyperplanes are deterministic from a seed so results reproduce.

Design note (scale): for a true 100 TB corpus the right physical plan is
(1) bucket both sides by LSH key (shuffle on key, uniform by construction),
(2) per-bucket exact rerank, (3) union over tables + global top-k window.
That is exactly what lsh_topk builds, with Catalyst-only expressions.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_norm",
    "cosine_sim_expr",
    "brute_force_topk",
    "lsh_topk",
    "lsh_topk_int",
    "int_banded",
    "ivf_centroids",
    "ivf_topk",
    "pq_codes",
    "pq_topk",
    "ivfpq_topk",
    "topk_recall",
]


def with_norm(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Project to (id, vec double[], norm) once; reused by joins."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.select(F.col(id_col), vec.alias("__vec"), norm.alias("__norm"))


def cosine_sim_expr(va: str, vb: str, na: str, nb: str) -> Column:
    dot = F.aggregate(
        F.zip_with(F.col(va), F.col(vb), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(na) * F.col(nb))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Ties broken by neighbor id ascending (after 6-decimal rounding) so the
    result is deterministic and oracle-comparable.
    """
    q = with_norm(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec").alias("__vq"), F.col("__norm").alias("__nq")
    )
    c = with_norm(corpus, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__vec").alias("__vc"), F.col("__norm").alias("__nc")
    )
    cond = F.col("query_id") != F.col("neighbor_id") if exclude_self else F.lit(True)
    sims = q.join(c, cond).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim_expr("__vq", "__vc", "__nq", "__nc"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via sign-LSH bucketing.

    Each table hashes vectors to a `bits`-bit bucket (sign of dot with fixed
    random hyperplanes); candidates are same-bucket pairs in any table, then
    exact cosine reranks. Shuffle key = (table, bucket) — cardinality
    num_tables * 2^bits, uniform by construction.
    """

    def bucket_expr(table: int) -> Column:
        planes = _hyperplanes(dim, bits, seed + table)
        acc = F.lit(0).cast("long")
        for b in range(bits):
            row = planes[b]
            dot = F.lit(0.0)
            for j in range(dim):
                if abs(row[j]) > 0:
                    dot = dot + F.col("__vec")[j] * F.lit(float(row[j]))
            acc = acc + F.when(dot >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        return acc

    def banded(df: DataFrame, label: str) -> DataFrame:
        base = with_norm(df, vec_col, id_col)
        tables = F.array(*[F.struct(F.lit(t).alias("t"), bucket_expr(t).alias("b")) for t in range(num_tables)])
        return base.select(
            F.col(id_col).alias(label),
            F.col("__vec").alias(f"__v_{label}"),
            F.col("__norm").alias(f"__n_{label}"),
            F.explode(tables).alias("__tb"),
        ).select(label, f"__v_{label}", f"__n_{label}", F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b"))

    qb = banded(queries, "query_id")
    cb = banded(corpus, "neighbor_id")
    return _rerank_pairs(qb, cb, k, exclude_self)


def _rerank_pairs(qb: DataFrame, cb: DataFrame, k: int, exclude_self: bool) -> DataFrame:
    """Shared tail of the LSH pipelines: same-bucket join -> distinct pair ->
    exact cosine rerank -> per-query top-k window."""
    cond = [qb["t"] == cb["t"], qb["b"] == cb["b"]]
    pairs = qb.join(cb, cond)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim_expr("__v_query_id", "__v_neighbor_id", "__n_query_id", "__n_neighbor_id"), 6).alias(
            "cosine"
        ),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def int_hyperplane(table: int, bit: int, j: int, bits: int = 6, dim: int = 64) -> int:
    """Deterministic integer hyperplane entry in [-3, 3].

    Pure int64 arithmetic (Knuth-multiplier LCG over a unique (table, bit, j)
    index, mod a large prime, then mod 7), so ANY engine — Spark, DuckDB,
    NumPy — reproduces it exactly. The unique linear index makes planes
    independent ACROSS tables and bits; a purely additive table term would
    make every table a residue-rotation of the same plane (zero extra recall
    per table). Used by `lsh_topk_int`, whose whole bucketing stage is
    therefore cross-engine hash-matchable.
    """
    idx = (table * bits + bit) * dim + j + 1
    return ((idx * 2654435761) % 1000003 % 7) - 3


def lsh_topk_int(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 6,
    num_tables: int = 6,
    quantize_scale: int = 1000,
    exclude_self: bool = True,
) -> DataFrame:
    """Sign-LSH top-k with *integer* hyperplanes and quantized vectors.

    Same physical plan as `lsh_topk` — bucket both sides on (table, bucket),
    per-bucket exact cosine rerank, global top-k window — but the bucket
    computation is exact int64 arithmetic: vectors are quantized with
    floor(v*scale) and hyperplane entries come from `int_hyperplane`. No
    float summation order can flip a sign, so an independent engine (the
    DuckDB oracle) reproduces the candidate set bit-for-bit. This is the
    driver-verifiable face of the 100 TB ANN path.
    """
    qb = int_banded(queries, "query_id", dim, vec_col, id_col, bits, num_tables, quantize_scale)
    cb = int_banded(corpus, "neighbor_id", dim, vec_col, id_col, bits, num_tables, quantize_scale)
    return _rerank_pairs(qb, cb, k, exclude_self)


def _int_bucket_sql(table: int, bits: int, dim: int) -> str:
    # one SQL string per side instead of thousands of Column objects:
    # py4j round-trips dominate build time otherwise (~15 s -> <1 s)
    parts = []
    for b in range(bits):
        planes = ",".join(f"{int_hyperplane(table, b, j, bits, dim)}L" for j in range(dim))
        dot = f"aggregate(zip_with(__qv, array({planes}), (x,h) -> x*h), 0L, (a,x) -> a+x)"
        parts.append(f"(case when {dot} >= 0 then {1 << b}L else 0L end)")
    return "(" + "+".join(parts) + ")"


def int_banded(
    df: DataFrame,
    label: str,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 6,
    num_tables: int = 6,
    quantize_scale: int = 1000,
) -> DataFrame:
    """(id as `label`, __v_label, __n_label, t, b): one row per (vector,
    LSH table) with its exact-int64 sign-LSH bucket — the shared bucketing
    stage of `lsh_topk_int` and `embedding_cosine_dups_lsh` (dedup.py)."""
    base = with_norm(df, vec_col, id_col).withColumn(
        "__qv", F.transform(F.col("__vec"), lambda x: F.floor(x * quantize_scale).cast("long"))
    )
    tables = F.expr(
        "array("
        + ",".join(f"struct({t} as t, {_int_bucket_sql(t, bits, dim)} as b)" for t in range(num_tables))
        + ")"
    )
    return base.select(
        F.col(id_col).alias(label),
        F.col("__vec").alias(f"__v_{label}"),
        F.col("__norm").alias(f"__n_{label}"),
        F.explode(tables).alias("__tb"),
    ).select(label, f"__v_{label}", f"__n_{label}", F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b"))


def _int_dot_sql(cvec: list[int]) -> str:
    planes = ",".join(f"{int(c)}L" for c in cvec)
    return f"aggregate(zip_with(__qv, array({planes}), (x,h) -> x*h), 0L, (a,x) -> a+x)"


def ivf_centroids(corpus: DataFrame, n_lists: int, vec_col: str = "embedding",
                  id_col: str = "vec_id", quantize_scale: int = 1000) -> list[tuple[int, list[int]]]:
    """Deterministic coarse quantizer: the quantized vectors of the n_lists
    lowest ids. A k-means trainer would refine these at scale; a sampled
    quantizer is a standard IVF bootstrap and — being exact int64 — lets an
    independent engine reproduce every list assignment bit-for-bit."""
    rows = (
        corpus.select(F.col(id_col).alias("cid"),
                      F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * quantize_scale).cast("long")).alias("cqv"))
        .orderBy("cid")
        .limit(n_lists)
        .collect()
    )
    return [(int(r["cid"]), [int(v) for v in r["cqv"]]) for r in rows]


def _ivf_sided(df: DataFrame, label: str, cents: list[tuple[int, list[int]]],
               n_probe: int, vec_col: str, id_col: str, quantize_scale: int) -> DataFrame:
    """(id as label, __v_label, __n_label, t=0, b=list_id) — one row per
    probed inverted list. Assignment = argmax exact-int64 dot against the
    centroid table, ties to the lowest centroid id (struct-max on (dot, -id));
    probes = the n_probe best lists in that order."""
    base = with_norm(df, vec_col, id_col).withColumn(
        "__qv", F.transform(F.col("__vec"), lambda x: F.floor(x * quantize_scale).cast("long"))
    )
    structs = ",".join(
        f"struct({_int_dot_sql(cvec)} as d, {-cid}L as nj)" for cid, cvec in cents
    )
    probes = F.expr(
        f"transform(slice(reverse(array_sort(array({structs}))), 1, {int(n_probe)}), s -> -s.nj)"
    )
    return base.select(
        F.col(id_col).alias(label),
        F.col("__vec").alias(f"__v_{label}"),
        F.col("__norm").alias(f"__n_{label}"),
        F.explode(probes).alias("b"),
    ).withColumn("t", F.lit(0))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 8,
    n_probe: int = 2,
    quantize_scale: int = 1000,
    exclude_self: bool = True,
    train_iters: int = 0,
) -> DataFrame:
    """Approximate cosine top-k via an IVF-Flat index (inverted file lists).

    Corpus vectors are assigned to their single nearest inverted list
    (argmax integer dot product against the centroid table); queries probe
    their ``n_probe`` best lists; candidates are per-list pairs with an
    exact cosine rerank and a per-query top-k window — the canonical
    IVF-Flat physical plan: shuffle keyed on list id (n_lists lists, so at
    cluster scale centroid count is sized ~sqrt(n) and the per-list join is
    the parallelism unit). The quantizer is exact int64 so the DuckDB
    oracle reproduces the same candidate sets; recall < 1 by construction,
    identical across engines.
    """
    if train_iters > 0:
        # refine the sampled quantizer with the deterministic integer-exact
        # k-means trainer (embeddings.kmeans_quantized) — list occupancy
        # balances toward the data's actual density; still fully
        # reproducible (every centroid coordinate is an int64)
        from .embeddings import kmeans_quantized

        _, trained = kmeans_quantized(
            corpus, k=n_lists, iters=train_iters, vec_col=vec_col,
            id_col=id_col, scale=quantize_scale,
        )
        cents = list(enumerate(trained))
    else:
        cents = ivf_centroids(corpus, n_lists, vec_col, id_col, quantize_scale)
    cb = _ivf_sided(corpus, "neighbor_id", cents, 1, vec_col, id_col, quantize_scale)
    qb = _ivf_sided(queries, "query_id", cents, n_probe, vec_col, id_col, quantize_scale)
    return _rerank_pairs(qb, cb, k, exclude_self)


def pq_codes(
    corpus: DataFrame,
    m: int = 4,
    k_codebook: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> tuple[DataFrame, list[list[list[int]]], int]:
    """Product-quantization compression (Jegou et al. 2011): split each
    d-dim vector into ``m`` subvectors and learn an integer-exact
    ``k_codebook``-centroid codebook per subspace with the deterministic
    quantized Lloyd trainer (embeddings.kmeans_quantized — the same
    engine-replayable arithmetic the IVF quantizer uses).

    Returns (codes, codebooks, dim): codes has one row per vector —
    (id_col, code_0 .. code_{m-1}) — codebooks[j][c] is the int64
    centroid of code c in subspace j, and dim is the vector dimension
    (returned so ADC callers need not re-scan the corpus to recover it).
    The memory story IS the operator:
    a 64-dim float32 corpus compresses to m log2(k) bits per vector
    (4 bytes at m=4, k=16 — 64x), which is what lets a 100 TB embedding
    corpus live in executor memory for ADC scans.

    Scale shape (r14 OPT, guide §1.2): the m per-subspace Lloyd runs are
    ONE grouped trainer keyed by subspace index
    (embeddings.kmeans_quantized_grouped) — each iteration is a single
    Arrow pass over the exploded (id, j, subvector) frame emitting
    (j, cluster) partials for every subspace at once, m x fewer scans
    than independent runs and bit-identical per subspace (all int64).
    The assignment table is localCheckpointed in LONG form (id, j, code);
    the wide (id, code_0..code_{m-1}) API shape is one small pivot of it.
    """
    codes_long, books, dim = _pq_codes_long(
        corpus, m, k_codebook, iters, vec_col, id_col, scale
    )
    codes = codes_long.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("j") == j, F.col("code"))).alias(f"code_{j}")
            for j in range(m)
        ]
    )
    return codes, books, dim


def _pq_codes_long(
    corpus: DataFrame,
    m: int,
    k_codebook: int,
    iters: int,
    vec_col: str,
    id_col: str,
    scale: int,
) -> tuple[DataFrame, list[list[list[int]]], int]:
    """PQ trainer core: (codes_long (id_col, j, code) — localCheckpointed,
    codebooks, dim). ADC consumers join this long table directly, skipping
    the wide pivot ``pq_codes`` keeps for its API shape."""
    from .embeddings import kmeans_quantized_grouped

    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("corpus is empty")
    dim = int(first["d"])
    if m < 1 or dim % m != 0:
        raise ValueError(f"m={m} must divide the dimension {dim}")
    sd = dim // m
    # r14 OPT (guide §2.5 input skew): a single-split parquet corpus would
    # run the subvector posexplode + quantization in ONE task (profiled
    # ~6.5 s serialized per execution at sf0.1) before the grouped
    # trainer's first shuffle spreads it. Partitioning only — the trainer's
    # int64 partials are merge-order free and its init window is keyed, so
    # results are bit-identical. At real scale the scan has many splits and
    # this never fires.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < min(par, 8):
        corpus = corpus.repartition(par)
    sub = corpus.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(F.col(vec_col), j * sd + 1, sd),
            )
        ).alias("j", "__sub"),
    )
    assign, cents_by_j = kmeans_quantized_grouped(
        sub, k=k_codebook, iters=iters, vec_col="__sub", id_col=id_col,
        key_col="j", scale=scale,
    )
    books = [
        [list(map(int, c)) for c in cents_by_j[j]] for j in range(m)
    ]
    codes_long = assign.withColumnRenamed("cluster", "code")
    return codes_long, books, dim


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = 4,
    k_codebook: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate nearest neighbours by asymmetric distance computation
    (ADC) over a product-quantized corpus — the exhaustive PQ scan of
    Jegou et al. 2011: every corpus vector is represented only by its m
    codebook codes, and dist(q, x) ~= sum_j ||q_sub_j - codebook_j[code_j(x)]||^2.

    All arithmetic is int64-exact (quantized queries against integer
    centroids), so the approximation is deterministic and the DuckDB
    oracle replays every distance and rank bit-for-bit. Ties break by
    neighbour id ascending. Returns (query_id, neighbor_id, adist, rank).

    Scale shape: the corpus never re-materializes its vectors after
    encoding — the scan reads (id, m codes) only. The per-query distance
    TABLE (queries x m x k_codebook rows, integers) is broadcast and
    joined on (subspace, code); per-pair cost is a broadcast-hash lookup
    + an m-row sum, the classic ADC inner loop. Candidate pruning for
    trillion-row corpora composes upstream (ivf_topk's list assignment
    keys both sides); this face is the exhaustive scan the paper
    benchmarks, exact within PQ's quantization error.
    """
    codes_raw, books, dim = _pq_codes_long(
        corpus, m, k_codebook, iters, vec_col, id_col, scale
    )
    codes_long = codes_raw.select(
        F.col(id_col).alias("neighbor_id"), "j", "code"
    )
    dtab = _pq_dtab(queries, books, m, dim // m, vec_col, id_col, scale)
    scored = (
        codes_long.join(F.broadcast(dtab), ["j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d").alias("adist"))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _pq_dtab(
    queries: DataFrame,
    books: list,
    m: int,
    sd: int,
    vec_col: str,
    id_col: str,
    scale: int,
) -> DataFrame:
    """Shared ADC plumbing: the broadcastable (query_id, j, code, __d)
    integer distance table. (The code side now comes straight from
    ``_pq_codes_long`` — already long — so this builds only the query
    side.)"""
    spark = queries.sparkSession
    book_rows = [
        (j, c, books[j][c]) for j in range(m) for c in range(len(books[j]))
    ]
    bdf = spark.createDataFrame(book_rows, "j int, code long, cqv array<bigint>")
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
    )
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(qv, j * sd + 1, sd),
            )
        ).alias("j", "__qsub"),
    )
    dtab = qsub.join(F.broadcast(bdf), "j").select(
        "query_id",
        "j",
        "code",
        F.aggregate(
            F.zip_with("__qsub", "cqv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("__d"),
    )
    return dtab


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codebook: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    exclude_self: bool = True,
    encode: str = "raw",
) -> DataFrame:
    """IVFADC-shaped ANN (Jegou et al. 2011): coarse inverted-list pruning
    composed with the PQ asymmetric-distance rerank — the full
    memory-AND-compute scale shape. The candidate set shrinks by
    ~n_probe/n_lists via the IVF stage, and each surviving candidate costs
    an m-term integer table lookup instead of a d-term float dot.

    ``encode`` picks the PQ input: ``'raw'`` (default) PQ-encodes the raw
    vectors — the oracle-stable simplification ("IVF pruning + PQ
    compression"); ``'residual'`` PQ-encodes (vector − coarse centroid),
    the paper's actual IVFADC — residuals concentrate around the origin so
    the same codebook budget quantizes finer and recall rises at equal
    (m, k). Both paths are int64-exact end to end: quantized vectors and
    centroids subtract exactly, and the residual codebooks train with
    scale=1 on already-integer values, so list assignment, candidates,
    codes, distances and ranks all replay bit-for-bit in an independent
    engine either way. Recall < 1 by construction (both stages prune).

    Scale shape: list assignment is the existing int-dot argmax
    (broadcast centroid table, map-side); candidates come from ONE
    equi-join keyed on list id; ADC scoring joins the broadcast
    (query x subspace x code — x probed-list for residual) integer table —
    no candidate ever touches a full vector after encoding.
    """
    if encode not in ("raw", "residual"):
        raise ValueError(f"encode must be 'raw' or 'residual', got {encode!r}")
    cents = ivf_centroids(corpus, n_lists, vec_col, id_col, scale)
    cb = _ivf_sided(corpus, "neighbor_id", cents, 1, vec_col, id_col, scale)
    qb = _ivf_sided(queries, "query_id", cents, n_probe, vec_col, id_col, scale)
    if encode == "residual":
        return _ivfpq_residual(
            queries, corpus, cb, qb, cents, k, m, k_codebook, iters,
            vec_col, id_col, scale, exclude_self,
        )
    cand = (
        qb.select("query_id", "b")
        .join(cb.select("neighbor_id", "b"), "b")
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    codes_raw, books, dim = _pq_codes_long(
        corpus, m, k_codebook, iters, vec_col, id_col, scale
    )
    codes_long = codes_raw.select(
        F.col(id_col).alias("neighbor_id"), "j", "code"
    )
    dtab = _pq_dtab(queries, books, m, dim // m, vec_col, id_col, scale)
    scored = (
        cand.join(codes_long, "neighbor_id")
        .join(F.broadcast(dtab), ["query_id", "j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _ivfpq_residual(
    queries: DataFrame,
    corpus: DataFrame,
    cb: DataFrame,
    qb: DataFrame,
    cents: list,
    k: int,
    m: int,
    k_codebook: int,
    iters: int,
    vec_col: str,
    id_col: str,
    scale: int,
    exclude_self: bool,
) -> DataFrame:
    """The encode='residual' body of ivfpq_topk: PQ over (quantized vector −
    assigned coarse centroid), query ADC tables per probed list.

    Exactness: residuals are int64 minus int64; the residual codebooks
    train via kmeans_quantized at scale=1 on integer-valued doubles
    (|residual| << 2^53, so the double round-trip is lossless) — every
    downstream quantity stays integer.

    Scale shape: one broadcast centroid join adds the residual column to
    each side; corpus residuals feed the same m-subspace Lloyd trainer;
    the ADC table grows n_probe-fold versus raw (a query's residual
    differs per probed list) but remains (queries x n_probe x m x k) ints
    — still broadcastable; candidates join on (query, list) so each
    candidate is scored against the single correct per-list table.
    """
    spark = corpus.sparkSession
    dim = len(cents[0][1])
    if m < 1 or dim % m != 0:
        raise ValueError(f"m={m} must divide the dimension {dim}")
    sd = dim // m
    # _ivf_sided's list id b IS the centroid id (the sampled row's vec_id),
    # so the centroid lookup table keys by cid, not by position
    cent_df = spark.createDataFrame(
        [(cid, cvec) for cid, cvec in cents], "b bigint, __cent array<bigint>"
    )
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
    )
    # corpus residual: quantized vector minus its assigned list's centroid,
    # carried as integer-valued doubles for the scale=1 trainer
    cres = (
        corpus.select(F.col(id_col), qv.alias("__qv"))
        .join(cb.select(F.col("neighbor_id").alias(id_col), "b"), id_col)
        .join(F.broadcast(cent_df), "b")
        .select(
            F.col(id_col),
            F.col("b").alias("__list"),
            F.zip_with(
                "__qv", "__cent", lambda a, c: (a - c).cast("double")
            ).alias("__res"),
        )
    )
    codes_raw, books, _ = _pq_codes_long(
        cres, m, k_codebook, iters, "__res", id_col, 1
    )
    codes_long = codes_raw.join(
        cres.select(id_col, "__list"), id_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__list").alias("b"),
        "j",
        "code",
    )
    # query residual PER PROBED LIST -> per-(query, list) ADC distance table
    book_rows = [
        (j, c, books[j][c]) for j in range(m) for c in range(len(books[j]))
    ]
    bdf = spark.createDataFrame(book_rows, "j int, code long, cqv array<bigint>")
    qres = (
        queries.select(F.col(id_col).alias("query_id"), qv.alias("__qv"))
        .join(qb.select("query_id", "b"), "query_id")
        .join(F.broadcast(cent_df), "b")
        .select(
            "query_id",
            "b",
            F.zip_with("__qv", "__cent", lambda a, c: a - c).alias("__qres"),
        )
    )
    qsub = qres.select(
        "query_id",
        "b",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice("__qres", j * sd + 1, sd),
            )
        ).alias("j", "__qsub"),
    )
    dtab = qsub.join(F.broadcast(bdf), "j").select(
        "query_id",
        "b",
        "j",
        "code",
        F.aggregate(
            F.zip_with("__qsub", "cqv", lambda a, b_: (a - b_) * (a - b_)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("__d"),
    )
    cand = qb.select("query_id", "b").join(
        cb.select("neighbor_id", "b"), "b"
    ).select("query_id", "neighbor_id", "b")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(codes_long, ["neighbor_id", "b"])
        .join(F.broadcast(dtab), ["query_id", "b", "j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact baseline —
    the evaluation face every ANN tuning loop needs (probe counts, band
    widths and PQ code sizes trade recall for cost; this measures the
    trade). Both inputs are (query_id, neighbor_id, ..., rank) frames as
    produced by the *_topk operators; ``k`` truncates both sides (defaults
    to whatever ranks are present).

    Returns one row per query present in the EXACT baseline:
    (query_id, n_exact, n_hit, recall) with recall = n_hit / n_exact —
    queries the approximate index missed entirely score 0 rather than
    disappearing. One keyed join + one keyed groupBy; evaluation cost is
    the result size, never the corpus.
    """
    a = approx.select("query_id", "neighbor_id", "rank")
    e = exact.select("query_id", "neighbor_id", "rank")
    if k is not None:
        a = a.filter(F.col("rank") <= int(k))
        e = e.filter(F.col("rank") <= int(k))
    hits = e.join(
        a.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.sum("__hit"), F.lit(0)) / F.count(F.lit(1)), 6
        ).alias("recall"),
    )
