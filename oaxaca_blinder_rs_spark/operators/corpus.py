"""Composite corpus-preparation pipeline (net-new scale surface).

The standard LLM training-data flow, composed from this package's verified
stages: quality/language gating (textops) -> exact dedup on a canonical
prefix fingerprint (keep the lowest id per group) -> near-dup clustering
(n-gram Jaccard edges -> connected components, dedup.dup_clusters) ->
cluster representatives survive. One call takes a raw documents frame to a
train-ready keep-list with its quality metadata.

Scale notes: the near-dup edge set defaults to size-pruned all-pairs —
right for contract-scale verification; at corpus scale pass
``candidate_pairs`` built from ``dedup.minhash_lsh_candidates`` (banded
shuffle) so no all-pairs join ever runs. Every stage is a shuffle on a
bounded key (hash, bucket, node id); nothing funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textops

__all__ = [
    "prepare_corpus",
    "pack_token_shards",
    "cross_corpus_dedup",
    "ngram_contamination",
    "chunk_documents",
    "ingest_increment",
    "seed_classifier_scores",
    "dsir_importance",
    "dsir_ratio_table",
    "dsir_score_expr",
    "source_token_quota",
    "hashed_bow",
    "deterministic_shuffle",
    "interleave_sources",
    "split_leakage_report",
    "quality_percentile_filter",
    "length_bucketed_shards",
    "pack_sequences",
]


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.9,
    shingle_k: int = 3,
    candidate_pairs: DataFrame | None = None,
    candidates: str = "auto",
    lsh_threshold: int = 5000,
    max_top_bigram_frac: float | None = None,
    min_mean_logprob: float | None = None,
    scrub_pii: bool = False,
    blocklist_terms: list[str] | None = None,
) -> DataFrame:
    """Raw documents -> (doc_id, n_tokens, quality, lang) keep-list
    (plus ``text`` when ``scrub_pii=True``).

    Stages: (1) keep docs with quality_score >= min_quality and a language
    guess in ``langs``; (2) exact dedup on the 5-token-prefix md5, keeping
    the lowest doc id per group; (3) near-dup clustering at
    ``jaccard_threshold`` over ``shingle_k``-gram shingles, keeping each
    cluster's lowest-id representative.

    Optional gates (all default off, so the verified default pipeline is
    unchanged): ``max_top_bigram_frac`` drops documents whose most frequent
    bigram exceeds that share (Gopher repetition rule);
    ``min_mean_logprob`` drops documents below that mean bigram
    log-probability under the corpus LM (CCNet-style); ``scrub_pii=True``
    carries a redacted ``text`` column through to the keep-list;
    ``blocklist_terms`` drops any document containing a banned whole token
    (the C4 bad-words rule, textops.blocklist_filter) BEFORE the quality
    gate — cheapest predicate first, and it filters inline in the scan in
    the literal-terms regime.

    Candidate edges for stage 3: ``candidate_pairs`` when given; otherwise
    ``candidates`` picks the generator — ``"allpairs"`` (size-pruned exact,
    full recall), ``"lsh"`` (banded MinHash shuffle, the corpus-scale path),
    or ``"auto"`` (default): one count of the gated survivors decides,
    all-pairs at or below ``lsh_threshold`` docs, LSH above. The count job
    costs one scan of the (small, post-filter) projection and removes the
    need for callers to know the corpus size up front.
    """
    t = F.col("__text")
    # Spread an under-partitioned input before the gate expressions: a small
    # parquet file arrives as ONE split, serializing the (constant-heavy)
    # quality/lang codegen onto a single core — profiled as ~10 s of the
    # sf0.1 pipeline on local[32]. At real corpus scale the scan has
    # thousands of splits and this branch never fires, so the full-text
    # shuffle is only ever paid when it is cheap.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < min(par, 8):
        docs = docs.repartition(par)
    if blocklist_terms:
        docs = textops.blocklist_filter(docs, blocklist_terms, text_col=text_col, id_col=id_col)
    scored = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        textops.token_count(F.col(text_col)).alias("n_tokens"),
        F.round(textops.quality_score(F.col(text_col)), 6).alias("quality"),
        textops.lang_id(F.col(text_col)).alias("lang"),
    )
    kept = scored.filter(
        (F.col("quality") >= float(min_quality)) & F.col("lang").isin(list(langs))
    )

    if max_top_bigram_frac is not None:
        rep = textops.repetition_stats(docs, text_col=text_col, id_col=id_col, n=2)
        too_rep = rep.filter(F.col("top_frac") > float(max_top_bigram_frac)).select(id_col)
        kept = kept.join(too_rep, id_col, "left_anti")
    if min_mean_logprob is not None:
        lp = textops.ngram_logprob(docs, text_col=text_col, id_col=id_col)
        too_odd = lp.filter(F.col("mean_logprob") < float(min_mean_logprob)).select(id_col)
        kept = kept.join(too_odd, id_col, "left_anti")

    # exact dedup: canonical 5-token-prefix fingerprint, keep min id
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    kept = kept.withColumn("__fp", F.md5(F.concat_ws(" ", F.slice(toks, 1, 5))))
    reps = kept.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    kept = kept.join(reps, ["__fp", id_col]).drop("__fp")

    # validate BEFORE the persist below so a bad argument cannot leak the cache
    if candidate_pairs is None and candidates not in ("auto", "allpairs", "lsh"):
        raise ValueError(f"candidates must be auto|allpairs|lsh, got {candidates!r}")

    # The gated+exact-deduped projection feeds MANY downstream actions
    # (the auto-mode count, candidate generation, BOTH sides of the
    # jaccard verify join, the survivor anti-join) — without persistence
    # every action re-runs the quality/lang expressions and the dedup
    # shuffle from the raw scan (~6 re-evaluations, profiled as most of
    # the r8 corpus_prepare bench entry). MEMORY_AND_DISK cache here,
    # released after the result is checkpointed below; at 100 TB the
    # survivors are the small end of the funnel, exactly what you want
    # materialized once. try/finally so a mid-pipeline failure (candidate
    # generation, the verify join) cannot leak the cache for the session.
    kept = kept.persist()
    try:
        # near-dup clustering among survivors
        if candidate_pairs is None:
            mode = candidates
            if mode == "auto":
                mode = "lsh" if kept.count() > int(lsh_threshold) else "allpairs"
            if mode == "allpairs":
                # r14 OPT: prefix-filtered inverted-index candidates replace
                # the quadratic id x id enumeration — a lossless superset of
                # every pair the rounded jaccard_threshold verify can keep,
                # with the identical size-ratio prune applied inside, so the
                # verified edge set (and the survivors) are unchanged
                candidate_pairs = dedup.prefix_filtered_pairs(
                    kept, text_col="__text", id_col=id_col, k=shingle_k, threshold=jaccard_threshold
                )
            else:
                # spread=False: docs were spread at pipeline entry, and the
                # partition probe on this derived (joined+cached) frame
                # would trigger AQE stage materialization (r14 OPT)
                candidate_pairs = dedup.minhash_lsh_candidates(
                    kept, text_col="__text", id_col=id_col, k=shingle_k, spread=False
                )
        edges = dedup.ngram_jaccard(
            kept, candidate_pairs, text_col="__text", id_col=id_col, k=shingle_k
        ).filter(F.round("jaccard", 6) >= float(jaccard_threshold))
        clusters = dedup.dup_clusters(edges.select("id_a", "id_b"))
        dropped = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
            F.col("doc_id").alias(id_col)
        )
        survivors = kept.join(dropped, id_col, "left_anti")
        cols = [id_col, "n_tokens", "quality", "lang"]
        if scrub_pii:
            survivors = survivors.withColumn("text", textops.pii_scrub(t))
            cols.append("text")
        # materialize the keep-list eagerly (it is the small funnel end) so
        # the intermediate cache can be released and callers' repeated
        # actions on the result cost nothing
        return survivors.select(*cols).localCheckpoint()
    finally:
        kept.unpersist()


def pack_token_shards(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards:
    (id, n_tokens, token_offset, shard_id).

    ``token_offset`` is each document's global starting token position under
    the packing order (the offset a concatenate-and-chunk data loader would
    hand it); ``shard_id = token_offset // budget`` — the shard whose window
    contains the document's first token. The running total uses the
    distributed prefix-scan (scan.ordered_prev_cumsum): range-partition on
    the order key, tiny per-partition-sum collect, partition-local windows —
    no global single-task window, so the packing holds at corpus scale.

    ``order_cols`` sets the packing order (default: the deterministic id
    ordering). Pass ``["shuffle_key"]`` after
    ``deterministic_shuffle`` to pack the SHUFFLED concatenation order —
    shard composition becomes a pure function of the epoch seed (the
    shuffle-then-pack pipeline). ``id_col`` is always appended as the final
    tiebreaker, so the order is total regardless.

    Pass ``token_col`` when counts are precomputed (e.g. from a prior
    text_stats pass) to skip re-tokenizing.
    """
    from . import scan

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    names = [c for c in (order_cols or []) if c != id_col]
    for c in names:
        if c not in docs.columns:
            raise ValueError(f"order column not found: {c}")
    # Null text counts as empty text — same convention as source_token_quota;
    # a NULL token count would shift every later shard boundary.
    n_tok = (
        F.col(token_col)
        if token_col
        else textops.token_count(F.coalesce(F.col(text_col), F.lit("")))
    )
    base = docs.select(
        F.col(id_col), *[F.col(c) for c in names], n_tok.cast("long").alias("n_tokens")
    )
    packed = scan.ordered_prev_cumsum(
        base,
        [F.col(c).asc() for c in names] + [F.col(id_col).asc()],
        F.col("n_tokens"),
        "token_offset",
    )
    return packed.select(
        id_col,
        "n_tokens",
        F.col("token_offset").cast("long").alias("token_offset"),
        F.floor(F.col("token_offset") / F.lit(int(budget))).cast("long").alias("shard_id"),
    )


def cross_corpus_dedup(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.9,
    shingle_k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    candidates: str = "lsh",
    lsh_threshold: int = 5000,
) -> DataFrame:
    """Decontaminate a new document batch against an existing corpus:
    (doc_id, matched_ref_id, stage) for every NEW document that duplicates a
    REFERENCE document. stage = 'exact' (byte-identical text) or 'near'
    (n-gram Jaccard >= threshold through a cross-corpus MinHash-LSH join).

    The anti-join face of training-set decontamination: callers drop these
    ids from the new batch (``new_docs.join(result, id, 'left_anti')``).

    Scale shape: the exact stage joins on md5(text) (uniform key); the near
    stage bands BOTH corpora with identical MinHash parameters and joins on
    (band_idx, band_key) — only colliding bucket contents ever pair, the
    same banded-shuffle contract as the within-corpus LSH path. Jaccard
    verification touches candidate ids only. Reported matched_ref_id is the
    minimum matching reference id with exact preferred over near, so the
    result is deterministic and oracle-comparable.

    ``candidates`` picks the near-stage generator: ``"lsh"`` (default, the
    banded probabilistic path above — near-certain recall at the 0.9
    design threshold, weaker for moderate jaccard), ``"shingle"`` (EXACT
    recall: inverted shingle join — every pair sharing >= 1 shingle is
    verified; a keyed shuffle whose cost follows shingle document
    frequency, right for modest corpora and mandatory when the threshold
    is far below 0.9), or ``"auto"`` (shingle only when BOTH sides have at
    most ``lsh_threshold`` docs, else lsh). The shingle join explodes and
    distincts the REFERENCE corpus's shingles too, so auto must gate on
    both sides: a small daily batch against a large reference corpus would
    otherwise silently pay a corpus-sized explode+shuffle every ingest
    (r7 advisory).
    """
    t = F.col(text_col)
    new_fp = new_docs.select(F.col(id_col), F.md5(t).alias("__fp"))
    ref_fp = ref_docs.select(F.col(id_col).alias("__rid"), F.md5(t).alias("__fp"))
    exact = (
        new_fp.join(ref_fp, "__fp")
        .groupBy(id_col)
        .agg(F.min("__rid").alias("matched_ref_id"))
        .withColumn("stage", F.lit("exact"))
    )
    # r14 OPT (guide §5 reuse): exact matches are tiny but consumed twice
    # (result union + the near-stage anti-join); left lazy, each consumer
    # re-runs the md5 scan of BOTH corpora plus the fingerprint join
    exact = exact.localCheckpoint()

    if candidates not in ("auto", "lsh", "shingle"):
        raise ValueError(f"candidates must be auto|lsh|shingle, got {candidates!r}")
    mode = candidates
    if mode == "auto":
        # both counts are cheap single-column scans; short-circuit on the
        # new batch so the common small-batch-vs-big-corpus case pays the
        # reference count only when the batch side already qualified
        mode = (
            "shingle"
            if new_docs.count() <= int(lsh_threshold)
            and ref_docs.count() <= int(lsh_threshold)
            else "lsh"
        )
    if mode == "lsh":
        nb = dedup.minhash_bands(
            new_docs, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=shingle_k
        )
        rb = dedup.minhash_bands(
            ref_docs, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=shingle_k
        ).select(F.col(id_col).alias("__rid"), "band_idx", "band_key")
        cand = nb.join(rb, ["band_idx", "band_key"]).select(id_col, "__rid").distinct()
    else:
        ns = new_docs.select(
            F.col(id_col), F.explode(dedup.shingles(t, shingle_k)).alias("__s")
        ).distinct()
        rs = ref_docs.select(
            F.col(id_col).alias("__rid"), F.explode(dedup.shingles(t, shingle_k)).alias("__s")
        ).distinct()
        cand = ns.join(rs, "__s").select(id_col, "__rid").distinct()

    new_sh = new_docs.select(
        F.col(id_col), dedup.shingles(t, shingle_k).alias("__sh_n")
    )
    ref_sh = ref_docs.select(
        F.col(id_col).alias("__rid"), dedup.shingles(t, shingle_k).alias("__sh_r")
    )
    near = (
        cand.join(new_sh, id_col)
        .join(ref_sh, "__rid")
        .withColumn(
            "__j",
            F.size(F.array_intersect("__sh_n", "__sh_r")).cast("double")
            / F.size(F.array_union("__sh_n", "__sh_r")).cast("double"),
        )
        .filter(F.round("__j", 6) >= float(jaccard_threshold))
        .groupBy(id_col)
        .agg(F.min("__rid").alias("matched_ref_id"))
        .withColumn("stage", F.lit("near"))
    )
    # exact wins when a doc matches in both stages
    near_only = near.join(exact.select(id_col), id_col, "left_anti")
    return exact.unionByName(near_only)


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 5,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-n-gram contamination check of a training corpus against a
    probe set (eval benchmarks) — the standard "13-gram decontamination"
    audit, here with configurable ``n``. Complements cross_corpus_dedup's
    MinHash near-dup stage with the EXACT-overlap evidence auditors want:
    (doc_id, probe_id, n_shared, probe_ngrams, containment) for every
    (corpus doc, probe) pair sharing >= min_overlap distinct n-grams,
    containment = n_shared / probe's distinct n-gram count.

    Scale shape (100 TB corpus, small probe set): both sides explode their
    DISTINCT per-document n-grams (dedup.shingles — same tokenizer as every
    other text operator); the corpus side joins on xxhash64 of the n-gram
    (an 8-byte shuffle key instead of ~50-byte strings) against the
    BROADCAST probe-side hashes, so the corpus never shuffles — the join is
    map-side. Per-pair counts then aggregate on (doc, probe). A 64-bit hash
    collision could inflate a count (~1e-19 per pair); the DuckDB oracle
    joins on the n-gram STRINGS, so any collision would surface as a
    driver mismatch rather than hide.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    # r14 OPT (guide §2.5 input skew): spread a single-split corpus before
    # the shingle carve — the map-side join means no exchange ever spreads it
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < min(par, 8):
        docs = docs.repartition(par)
    d_ng = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(dedup.shingles(F.col(text_col), n)).alias("__ng"),
    ).select("doc_id", F.xxhash64("__ng").alias("__h"))
    # r14 OPT (guide §5 reuse + §2.5): the probe carve feeds BOTH the totals
    # and the broadcast hash side — spread it, then pin one evaluation
    if probes.rdd.getNumPartitions() < min(par, 8):
        probes = probes.repartition(par)
    p_sh = probes.select(
        F.col(id_col).alias("probe_id"),
        F.explode(dedup.shingles(F.col(text_col), n)).alias("__ng"),
    ).localCheckpoint()
    p_tot = p_sh.groupBy("probe_id").agg(F.count(F.lit(1)).alias("probe_ngrams"))
    p_ng = p_sh.select("probe_id", F.xxhash64("__ng").alias("__h"))
    pairs = (
        d_ng.join(F.broadcast(p_ng), "__h")
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_overlap))
    )
    return pairs.join(F.broadcast(p_tot), "probe_id").select(
        "doc_id",
        "probe_id",
        "n_shared",
        "probe_ngrams",
        F.round(F.col("n_shared") / F.col("probe_ngrams"), 6).alias("containment"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size whitespace-token windows with
    ``overlap`` shared tokens between consecutive chunks — the context-
    window chunking stage of a pre-training pipeline (the sibling of
    ``pack_token_shards``, which packs WHOLE documents; this slices WITHIN
    documents). Returns (doc_id, chunk_idx, n_tokens, chunk_text).

    Pure codegen, no Python and no shuffle: tokens = split(trim(text),
    '\\s+') (the package-wide whitespace convention, textops.py:61),
    chunk starts = sequence(0, ub, stride) with stride = chunk_size -
    overlap and ub = ceil(max(n - chunk_size, 0) / stride) * stride —
    the FIRST start whose window reaches the last token, so every token
    index is covered, only the final chunk may be short, and no chunk is
    wholly contained in its predecessor. A document with fewer tokens
    than chunk_size yields exactly one chunk. One posexplode per
    document; the operator is a deterministic pure function of the text
    and parameters, and the DuckDB oracle (chunk_documents in
    __spark_entry__.py) replays it with generate-series + list_slice.
    """
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    over = F.greatest(F.size(toks) - chunk_size, F.lit(0))
    ub = ((over + stride - 1) / stride).cast("int") * stride
    starts = F.sequence(F.lit(0), ub, F.lit(stride))
    pieces = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
    return docs.select(
        F.col(id_col), F.posexplode(pieces).alias("chunk_idx", "__c")
    ).select(
        id_col,
        "chunk_idx",
        F.size("__c").alias("n_tokens"),
        F.array_join("__c", " ").alias("chunk_text"),
    )


def seed_classifier_scores(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ridge: float = 1e-6,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """Model-based quality filtering (the CCNet / fastText-classifier
    pipeline stage): fit a ridge logistic regression of a SEED LABEL
    column (1.0 = looks like the target distribution — e.g. "is my
    curated reference corpus" or a heuristic proxy) on two cheap text
    features — English stopword ratio and log(1 + token count) — then
    score every document with the fitted membership probability.

    Returns one row per document: (id, score, keep = score >= threshold,
    6-dp rounded score — the repo's oracle-comparable convention).

    The fit is the reference-semantics Newton logit (glm.logit, ridge on
    the Hessian as in matching/logistic.rs:87-91): each iteration is ONE
    keyed aggregation pass collecting k(k+1)/2 + k Gram/score sums — at
    100 TB the per-pass shuffle is O(partitions x k^2), never a row
    collect — and scoring is a pure codegen expression over the same
    projection. k = 3 here, so the entire composition (feature exprs ->
    Newton stages -> sigmoid scores) replays in an independent SQL engine
    as unrolled CTE stages (the dfl oracle construction). No reference
    analogue (net-new LLM-pipeline surface).
    """
    from pyspark.sql import functions as FF

    from .glm import logit

    t = FF.col(text_col)
    design = docs.select(
        FF.col(id_col),
        FF.lit(1.0).alias("__icpt"),
        textops.stopword_ratio(t).alias("__stop"),
        FF.log(textops.token_count(t).cast("double") + FF.lit(1.0)).alias("__ltok"),
        FF.col(label_col).cast("double").alias("__y"),
    )
    xcols = ["__icpt", "__stop", "__ltok"]
    fit = logit(design, xcols, "__y", max_iter=max_iter, tol=tol, ridge=ridge)
    scored = design.withColumn("score", FF.round(fit.prob_expr(xcols, "logit"), 6))
    return scored.select(
        FF.col(id_col),
        "score",
        (FF.col("score") >= FF.lit(float(threshold))).alias("keep"),
    )


def ingest_increment(
    existing_docs: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.9,
    shingle_k: int = 3,
    cross_candidates: str = "auto",
    **prepare_kwargs,
) -> DataFrame:
    """Incremental corpus ingestion: gate + dedup a NEW batch against itself
    and against the already-kept corpus, returning the keep-list of batch
    documents to APPEND (same schema as prepare_corpus). The composition a
    daily pipeline runs instead of re-preparing the whole corpus:

        kept_new = ingest_increment(corpus_so_far, todays_batch)
        corpus_so_far = corpus_so_far UNION kept_new-docs

    Stage 1 runs prepare_corpus on the batch alone (quality/lang gates,
    exact + near dedup within the batch); stage 2 drops survivors that
    duplicate the existing corpus via cross_corpus_dedup (exact md5 join +
    banded MinHash near-dup, never all-pairs across corpora).

    Cost contract: with ``cross_candidates`` left at ``"auto"``, the
    cross-corpus stage uses the exact-recall shingle join only while BOTH
    the batch and the existing corpus are small (<= cross_corpus_dedup's
    ``lsh_threshold``); once the corpus outgrows it, auto switches to
    banded LSH and per-ingest cost scales with the BATCH — the existing
    side then contributes one md5-keyed join plus its banded signatures
    (one linear signature pass, no shingle explode). Pass
    ``cross_candidates="shingle"`` to keep exact recall regardless of
    corpus size (paying a corpus-sized shingle shuffle each ingest), or
    ``"lsh"`` to force the scale path even for small corpora.

    Equivalence contract: with batch ids larger than all existing ids (the
    natural append ordering), incremental ingestion keeps exactly the same
    documents as a full prepare_corpus over old+new — UNLESS a near-dup
    chain crosses the batch boundary through a "bridge" (new doc X within
    threshold of two old docs A, A' that are NOT within threshold of each
    other, or a transitive within-batch chain whose survivor falls below
    threshold of the old corpus). Bridged chains make any incremental
    dedup keep a superset of the rebuild along that chain — inherent to
    threshold-graph clustering, not to this implementation; run a periodic
    full rebuild (compaction) if exact parity matters. The suite pins both
    the equivalence on bridge-free data and the documented divergence
    direction on a crafted bridge.
    """
    keep = prepare_corpus(
        batch,
        text_col=text_col,
        id_col=id_col,
        min_quality=min_quality,
        langs=langs,
        jaccard_threshold=jaccard_threshold,
        shingle_k=shingle_k,
        **prepare_kwargs,
    )
    survivors = batch.join(keep.select(id_col), id_col)
    matches = cross_corpus_dedup(
        survivors,
        existing_docs,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        shingle_k=shingle_k,
        # default auto: exact-recall shingle join while both sides are
        # modest (the same recall the within-batch stage has), banded LSH
        # once either side outgrows the threshold — the equivalence
        # contract above assumes the candidate generator reaches every
        # >= threshold pair, which LSH only guarantees near the 0.9
        # design point; callers needing exact recall against a large
        # corpus pass cross_candidates="shingle" explicitly
        candidates=cross_candidates,
    )
    return keep.join(matches.select(id_col).distinct(), id_col, "left_anti")


def _dsir_bucket_expr(word, n_buckets: int, seed: int):
    """md5 bucket of a token — int(md5("b{seed}:" + w)[:8], 16) % B, the
    engine-portable convention shared with sampling.md5_uniform."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"b{seed}:"), word)), 1, 8), 16, 10)
        .cast("long")
        % int(n_buckets)
    )


def _dsir_bucketed(df: DataFrame, B: int, seed: int, text_col: str, cols: list) -> DataFrame:
    tok = df.select(
        *cols,
        F.explode(textops.tokens(F.lower(F.trim(F.col(text_col))))).alias("__w"),
    ).filter(F.col("__w") != "")
    return tok.select(*cols, _dsir_bucket_expr(F.col("__w"), B, seed).alias("__b"))


def dsir_ratio_table(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """The trained DSIR artifact: per-bucket importance log-ratios in int64
    micro-units — (bucket long, r_micro long), one row per bucket. Train
    once batch-side, then score anywhere: ``dsir_importance`` joins it
    back over the raw corpus, ``dsir_score_expr`` folds it into a
    stateless map-only expression (the streaming face's path)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    B = int(n_buckets)
    spark = raw.sparkSession
    universe = spark.range(B).select(F.col("id").alias("__b"))
    tgt = (
        _dsir_bucketed(target, B, seed, text_col, [])
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    rawc = (
        _dsir_bucketed(raw, B, seed, text_col, [])
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__cr"))
    )
    counts = (
        universe.join(tgt, "__b", "left")
        .join(rawc, "__b", "left")
        .select(
            "__b",
            F.coalesce("__ct", F.lit(0)).alias("__ct"),
            F.coalesce("__cr", F.lit(0)).alias("__cr"),
        )
    )
    totals = counts.agg(F.sum("__ct").alias("__nt"), F.sum("__cr").alias("__nr"))
    a = float(alpha)
    return counts.crossJoin(F.broadcast(totals)).select(
        F.col("__b").alias("bucket"),
        F.round(
            (
                F.log((F.col("__ct") + a) / (F.col("__nt") + a * B))
                - F.log((F.col("__cr") + a) / (F.col("__nr") + a * B))
            )
            * 1e6
        )
        .cast("long")
        .alias("r_micro"),
    )


def dsir_score_expr(
    ratio: dict[int, int],
    n_buckets: int,
    seed: int = 42,
    text_col: str = "text",
):
    """Stateless per-row DSIR score from a FROZEN ratio table: the token
    array folds through a B-entry map literal (bucket -> r_micro), so the
    score is one codegen expression — no explode, no shuffle, no state.
    This is the online-scoring shape: train the table batch-side
    (``dsir_ratio_table``), broadcast it as a literal, score a stream or
    a scan map-only. Exactly equal to ``dsir_importance``'s joined sum
    (same integers). Docs with no tokens score 0 here (no rows exist to
    aggregate in the batch face — the only shape difference)."""
    B = int(n_buckets)
    # each bucket adds two literal args to the map expression; past ~16k
    # buckets the expression tree is the wrong tool — use the joined path
    # (dsir_importance) with the ratio left as a DataFrame instead
    if B > 16384:
        raise ValueError(
            f"n_buckets={B} is too large for a map-literal score expression"
            " (use dsir_importance's join path above ~16k buckets)"
        )
    pairs: list = []
    for b in range(B):
        pairs.append(F.lit(b))
        pairs.append(F.lit(int(ratio.get(b, 0))))
    m = F.create_map(*pairs)
    toks = F.filter(
        textops.tokens(F.lower(F.trim(F.col(text_col)))), lambda w: w != ""
    )
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + m[_dsir_bucket_expr(w, B, seed)],
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023, DSIR):
    score every raw document by how target-like its hashed bag-of-words
    looks, for selecting pretraining data that matches a trusted corpus.

    Features are unigram counts hashed into ``n_buckets`` buckets with the
    repo's md5 convention (int(md5("b{seed}:" + token)[:8], 16) % B —
    bit-reproducible in Spark and DuckDB). Bucket unigram distributions
    p (target) and q (raw) get add-``alpha`` smoothing over the bucket
    universe; a document's importance log-weight is

        sum over tokens t of  ln p[bucket(t)] - ln q[bucket(t)].

    Arithmetic is int64-exact in the house style: the B per-bucket
    log-ratios quantize once to micro-units (round(ln-ratio * 1e6) as
    BIGINT — B values, each a ln of a ratio of exact integers), and each
    document's score is an exact integer dot product of its bucket counts
    with that table, so the result is independent of partitioning and
    summation order. With ``top_k`` the ``keep`` flag marks the k highest
    (score DESC, id ASC), ranked by the distributed prefix scan — never a
    single-task global window.

    Scale shape: two corpus explodes (raw + target) into B-bounded
    partial-agg groupBys, a B-row broadcast of the ratio table back onto
    the raw tokens, one groupBy(doc) integer sum. The target corpus is
    typically small and trusted (wiki/books); the raw side is the 100 TB
    axis and pays exactly one explode + one keyed shuffle.

    Returns (id_col, score_micro long[, keep boolean]).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    B = int(n_buckets)
    ratio = dsir_ratio_table(
        raw, target, n_buckets=B, alpha=alpha, seed=seed, text_col=text_col
    ).select(F.col("bucket").alias("__b"), F.col("r_micro").alias("__r"))
    rawb = _dsir_bucketed(raw, B, seed, text_col, [F.col(id_col)])
    doc_b = rawb.groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__n"))
    scores = (
        doc_b.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__r")).alias("score_micro"))
    )
    if top_k is None:
        return scores
    from .scan import ordered_prev_cumsum

    ranked = ordered_prev_cumsum(
        scores,
        order=[F.col("score_micro").desc(), F.col(id_col).asc()],
        value=F.lit(1.0),
        out_col="__rk",
    )
    return ranked.select(
        F.col(id_col),
        "score_micro",
        (F.col("__rk") < float(top_k)).alias("keep"),
    )


def source_token_quota(
    docs: DataFrame,
    budget_tokens: int,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Per-source token-budget caps — the domain-quota stage of a corpus
    mixing recipe (Dolma/RefinedWeb cap how much any one domain may
    contribute so head domains cannot swamp the mixture).

    Within each ``by`` group, documents accumulate in ascending id order
    (deterministic, the pack_token_shards convention) and a document is
    kept iff its EXCLUSIVE running token total is still under the budget —
    so every non-empty source keeps at least its first document, and the
    kept total may overshoot the budget by at most one document (the
    boundary convention shard packing uses; callers wanting a hard ceiling
    filter ``token_offset + n_tokens <= budget`` themselves).

    Returns (id_col, by, n_tokens, token_offset, keep) — the offsets are
    per-source positions, reusable as mixture bookkeeping.

    Scale shape: the per-source exclusive cumsum runs through
    scan.grouped_prev_cumsum — range-partitioned on (source, id) so a
    skewed source (one web domain holding half the corpus) spans
    partitions instead of serializing through one per-source window task;
    the per-(source, partition) offset fold is a tiny driver collect and
    totals are int64-exact. Pass ``token_col`` to skip re-tokenizing when
    counts are precomputed.
    """
    from . import scan

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    # Null text counts as empty text (the dup_substring_spans coalesce
    # convention) — without this, size(split(trim(NULL))) yields NULL and a
    # null-text document would silently shift every later offset in its
    # source (r9 ADVICE).
    n_tok = (
        F.col(token_col)
        if token_col
        else textops.token_count(F.coalesce(F.col(text_col), F.lit("")))
    )
    base = docs.select(
        F.col(id_col), F.col(by), n_tok.cast("long").alias("n_tokens")
    )
    out = scan.grouped_prev_cumsum(
        base, by, [F.col(id_col).asc()], F.col("n_tokens"), "token_offset"
    )
    return out.select(
        F.col(id_col),
        F.col(by),
        F.col("n_tokens"),
        F.col("token_offset"),
        (F.col("token_offset") < F.lit(int(budget_tokens))).alias("keep"),
    )


def hashed_bow(
    df: DataFrame,
    n_buckets: int = 64,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009): every document as a dense
    ``n_buckets``-dim hashed bag-of-words COUNT vector — the fixed-width,
    vocabulary-free featurization the DSIR scorer and seed classifier
    consume, exposed as its own primitive so any downstream model (logit,
    k-means, cosine dedup) can run on text without a vocabulary pass.

    Buckets use the shared md5 convention (``_dsir_bucket_expr``), so
    vectors from this operator are the exact feature space
    ``dsir_importance`` scores in. Returns (id_col, n_tokens, bow
    array<long>) with bow[b] = count of tokens hashing to bucket b;
    documents with no tokens are absent (the explode-based convention).

    Scale shape: one explode -> one (doc, bucket) partial-agg groupBy ->
    one per-doc map assembly (map_from_entries over <= n_buckets entries,
    dense array via a codegen transform). Nothing wider than B longs per
    document ever shuffles.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    B = int(n_buckets)
    counts = _dsir_bucketed(df, B, seed, text_col, [F.col(id_col)]).groupBy(
        id_col, "__b"
    ).agg(F.count(F.lit(1)).alias("__n"))
    per_doc = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__n")))
        ).alias("__m"),
        F.sum("__n").alias("n_tokens"),
    )
    dense = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(B - 1).cast("long")),
        lambda b: F.coalesce(F.element_at("__m", b), F.lit(0).cast("long")),
    )
    return per_doc.select(F.col(id_col), "n_tokens", dense.alias("bow"))


def deterministic_shuffle(
    docs: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    key_col: str = "shuffle_key",
    num_partitions: int | None = None,
) -> DataFrame:
    """Epoch-seeded deterministic global shuffle of a training corpus.

    At 100 TB "shuffle the data" cannot mean ORDER BY random(): training
    order must be REPRODUCIBLE (resume from a checkpoint, debug a loss
    spike at step N, re-run an epoch bit-identically) and the sort must
    never funnel through one task. The standard construction: key every
    row by a seeded hash of its stable id, then range-repartition + sort
    WITHIN partitions on that key — the concatenation of output partitions
    in order is a uniformly-pseudorandom total order, produced by one
    range shuffle with per-task local sorts (Spark's repartitionByRange
    samples partition bounds; the bounds affect only where partition
    seams fall, never the global order, so the ORDER is deterministic
    even though the seam placement is an implementation detail).

    ``shuffle_key`` = xxhash64('ep<seed>:' || id) — the same engine-portable
    prefix-seeded construction as the count-min sketch rows, so (a) each
    epoch seed selects an independent permutation (change the seed, get a
    fresh order; DataLoader-style epoch reshuffling with zero state) and
    (b) the key is oracle-checkable bit-for-bit via the XXH64 SQL
    transliteration. Ties are impossible in practice (64-bit keys), but
    the (key, id) composite sort makes the order total regardless.

    Returns the input schema + ``key_col``. Write with
    ``.write.parquet(...)`` and read the files in partition order (or
    feed a sequential reader) to consume the shuffled order.
    """
    key = F.xxhash64(F.concat(F.lit(f"ep{int(seed)}:"), F.col(id_col).cast("string")))
    keyed = docs.withColumn(key_col, key)
    nparts = int(num_partitions) if num_partitions else keyed.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    return keyed.repartitionByRange(int(nparts), F.col(key_col), F.col(id_col)).sortWithinPartitions(
        key_col, id_col
    )


def interleave_sources(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    pos_col: str = "stream_pos",
) -> DataFrame:
    """Deterministic source-interleaved training order: each source's
    documents are spread EVENLY through the epoch stream instead of
    clumping (a shard of all-web followed by a shard of all-code trains
    worse than the same data interleaved — mixture ratios should hold at
    every window of the stream, not just globally).

    The classic fractional-position construction: document r of n_g in its
    group gets the ideal position u = (r - 0.5) / n_g in [0, 1); the
    global order is (u, group, id) — so any prefix of the stream holds
    each source in proportion to its corpus share (off by at most one
    item per source, the best any deterministic interleave can do).
    Within a source the id order is preserved; compose with
    ``deterministic_shuffle`` FIRST (id -> shuffle_key) for a seeded
    random order within each source.

    Returns the input columns + ``pos_col`` (0-based global stream
    position). Rows with a NULL ``group_col`` are dropped (the count join
    is an equi-join, the ``quality_percentile_filter`` convention) —
    ``coalesce`` the column first to keep them.

    Scale shape: one broadcast count join + one per-group window
    (row_number over the group key — skew-bounded by the largest source,
    same profile as every per-source stage here) + the range-partitioned
    distributed prefix scan for the global position (``scan.
    grouped_prev_cumsum`` on a constant key: NO single-task global
    window, the ``_scan_plan``-audited primitive). u is (int - 0.5)/int
    in doubles — bit-identical in any engine, so the order is
    oracle-replayable.
    """
    from pyspark.sql import Window as _Window

    from . import scan

    n = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w = _Window.partitionBy(group_col).orderBy(id_col)
    keyed = (
        docs.join(F.broadcast(n), group_col)
        .withColumn("__u", (F.row_number().over(w) - 0.5) / F.col("__n"))
        .withColumn("__g", F.lit(0))
    )
    out = scan.grouped_prev_cumsum(
        keyed,
        "__g",
        [F.col("__u").asc(), F.col(group_col).asc(), F.col(id_col).asc()],
        F.lit(1),
        pos_col,
    )
    return out.drop("__n", "__u", "__g")


def split_leakage_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    train_split: str = "train",
    threshold: float = 0.9,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Cross-split contamination audit: which eval/test documents have an
    exact or near duplicate in the TRAIN split? ``split_corpus`` guarantees
    a ROW never lands in two splits, but a near-copy of a training document
    sitting in the eval split still leaks the answer — this is the check a
    training pipeline runs after splitting and before reporting eval
    numbers.

    Two stages, the ``cross_corpus_dedup`` construction applied across the
    split boundary instead of across corpora:

      exact: md5(text) equi-join eval x train (hash-keyed, no pairs);
      near:  MinHash-banded LSH candidates -> exact n-gram Jaccard verify
             at ``threshold`` (6-dp rounded, the repo convention) — banded
             shuffle, never an all-pairs join; pass ``candidate_pairs`` to
             reuse a precomputed candidate set.

    Returns one row per leaked non-train document: (``split_col``,
    ``id_col``, matched_train_id = the minimum qualifying train id, stage
    'exact' | 'near', exact taking precedence) — deterministic, engine-
    replayable, no floats beyond the thresholded Jaccard filter.
    """
    from . import dedup as _dedup

    tagged = docs.select(F.col(id_col), F.col(text_col), F.col(split_col))
    ev = tagged.filter(F.col(split_col) != train_split)
    tr = tagged.filter(F.col(split_col) == train_split)
    exact = (
        ev.select(id_col, split_col, F.md5(F.col(text_col)).alias("__h"))
        .join(
            tr.select(F.col(id_col).alias("__tid"), F.md5(F.col(text_col)).alias("__h")),
            "__h",
        )
        .groupBy(id_col, split_col)
        .agg(F.min("__tid").alias("matched_train_id"))
        .select(id_col, split_col, "matched_train_id", F.lit("exact").alias("stage"))
    )
    # r14 OPT (guide §5 reuse): the exact-stage table is tiny (leaked docs
    # only) but consumed twice (result union + the near-stage anti-join);
    # left lazy, each consumer re-runs the two md5 text scans + the equi-join
    exact = exact.localCheckpoint()
    pairs = (
        candidate_pairs
        if candidate_pairs is not None
        else _dedup.minhash_lsh_candidates(
            docs, text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, k=k,
        )
    )
    jac = _dedup.ngram_jaccard(docs, pairs, text_col=text_col, id_col=id_col, k=k)
    qual = jac.filter(F.round(F.col("jaccard"), 6) >= threshold)
    both = qual.select(
        F.col("id_a").alias("__x"), F.col("id_b").alias("__y")
    ).unionByName(qual.select(F.col("id_b").alias("__x"), F.col("id_a").alias("__y")))
    sp = tagged.select(F.col(id_col).alias("__sid"), F.col(split_col).alias("__split"))
    near = (
        both.join(sp.withColumnRenamed("__sid", "__x").withColumnRenamed("__split", "__sx"), "__x")
        .join(sp.withColumnRenamed("__sid", "__y").withColumnRenamed("__split", "__sy"), "__y")
        .filter((F.col("__sx") != train_split) & (F.col("__sy") == train_split))
        .groupBy(F.col("__x").alias(id_col), F.col("__sx").alias(split_col))
        .agg(F.min("__y").alias("matched_train_id"))
        .select(id_col, split_col, "matched_train_id", F.lit("near").alias("stage"))
    )
    near_only = near.join(exact.select(id_col), id_col, "left_anti")
    return exact.unionByName(near_only)


def quality_percentile_filter(
    docs: DataFrame,
    by_col: str = "source",
    score_col: str | None = None,
    keep_top: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "exact",
    accuracy: int = 1000,
) -> DataFrame:
    """Keep the top ``keep_top`` fraction of each group by a quality score —
    the STRATIFIED quality gate. A single global threshold lets a few
    high-scoring domains crowd out every low-resource one; cutting at each
    group's own percentile keeps the best half (say) of EVERY source.

    ``score_col`` names a numeric column (higher is better); None scores on
    the fly with textops.quality_score (6 dp, the contract rounding). Rows
    whose score is NULL are dropped (they cannot be ranked), and — like
    temperature_mixture — rows whose ``by_col`` group is NULL are dropped
    too (the inner equi-join against the per-group thresholds frame has no
    NULL key to match; a NULL-source document has no stratum to rank in).
    Pre-bucket NULL groups with ``coalesce(by_col, '(unknown)')`` if they
    must survive the gate.

    Keep rule: score >= the group's (1 - keep_top) quantile. Ties AT the
    threshold are all kept, so the realized fraction can exceed keep_top on
    tied data — deterministic, unlike any keep-exactly-k tie-break that
    would need a global per-group row ordering.

    Scale shape, two modes sharing the filter plan:
    - ``mode='exact'``: per-group type-7 percentile (``F.percentile``) —
      one sort-based aggregate per group; right for contract-scale
      verification and modest group rows.
    - ``mode='sketch'`` (the 100 TB path): ``approx_percentile`` — mergeable
      GK summaries, no per-group sort, rank error <= 1/accuracy (certified
      against the exact path by profiling.quantile_sketch_check). The
      threshold moves by at most that rank error, so the keep-set differs
      from exact only within an eps-band around the cut.

    Either way the thresholds frame is |groups| rows — broadcast back, one
    codegen filter; the corpus shuffles zero times.
    """
    if not 0.0 < float(keep_top) <= 1.0:
        raise ValueError("keep_top must be in (0, 1]")
    if mode not in ("exact", "sketch"):
        raise ValueError("mode must be exact|sketch")
    score = (
        F.col(score_col).cast("double")
        if score_col is not None
        else F.round(textops.quality_score(F.col(text_col)), 6)
    )
    scored = docs.withColumn("__q", score)
    p = 1.0 - float(keep_top)
    thr_expr = (
        F.expr(f"percentile(__q, {p})")
        if mode == "exact"
        else F.expr(f"approx_percentile(__q, {p}, {int(accuracy)})")
    )
    thresholds = scored.groupBy(by_col).agg(thr_expr.alias("__thr"))
    return (
        scored.join(F.broadcast(thresholds), by_col)
        .filter(F.col("__q") >= F.col("__thr"))
        .select(*docs.columns)  # the equi-join fronts by_col; restore order
    )


def length_bucketed_shards(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Assign documents to LENGTH-BUCKETED token-budget training shards:
    (id, n_tokens, len_bucket, bucket_offset, shard_seq).

    Plain packing mixes a 10-token snippet into the same shard as a
    10k-token article; a fixed-length batcher then pads everything in the
    batch to the longest member, and the padding bill is the length
    SPREAD. Bucketing by floor(log2(n_tokens + 1)) first keeps each
    shard's documents within a ~2x length band, so padding waste is
    bounded by half regardless of the corpus length distribution — the
    standard dynamic-batching trick, made deterministic.

    ``shard_seq`` is the shard index WITHIN the bucket
    (bucket_offset // budget, bucket_offset = exclusive running token sum
    under the id order inside the bucket); a loader streams
    (len_bucket, shard_seq) directories independently. Like
    pack_token_shards, a shard can overrun ``budget`` by at most one
    document.

    Scale shape: the running sums go through ``scan.grouped_prev_cumsum``
    — range-partitioned so one giant bucket (most corpora pile into 2-3
    middle buckets) SPANS partitions instead of serializing through one
    window task. One codegen projection + the grouped scan; nothing else.
    """
    from . import scan

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = (
        F.col(token_col)
        if token_col
        else textops.token_count(F.coalesce(F.col(text_col), F.lit("")))
    )
    base = docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
    ).withColumn(
        "len_bucket",
        F.floor(F.log2(F.col("n_tokens") + F.lit(1.0))).cast("int"),
    )
    packed = scan.grouped_prev_cumsum(
        base, "len_bucket", [F.col(id_col).asc()], F.col("n_tokens"), "bucket_offset"
    )
    return packed.select(
        id_col,
        "n_tokens",
        "len_bucket",
        F.col("bucket_offset").cast("long").alias("bucket_offset"),
        F.floor(F.col("bucket_offset") / F.lit(int(budget))).cast("long").alias("shard_seq"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos_token: str | None = None,
) -> DataFrame:
    """GPT-style SEQUENCE packing: concatenate the corpus's whitespace-token
    stream in ascending id order and cut it into fixed-length training
    sequences of exactly ``seq_len`` tokens — documents SPLIT across
    sequence boundaries (unlike ``pack_token_shards``, which assigns whole
    documents to shards). This is the "concat-and-chunk" step every
    pretraining loader runs; ``eos_token`` (appended to each document when
    given) is how the model sees document boundaries inside a packed
    sequence.

    Returns (seq_id, n_tokens, text): seq_id = 0.. in stream order, every
    sequence holds exactly ``seq_len`` tokens except the final remainder
    (no padding — the loader's collator owns pad tokens). NULL/empty text
    follows the corpus token convention (one empty token), so packing is
    total: every document lands in the stream. Consumer caveat: because an
    empty token joins into ``text`` as nothing (and leading whitespace
    collapses), re-splitting ``text`` under ``\\s+`` can yield fewer than
    ``n_tokens`` tokens — ``n_tokens`` is authoritative; see
    ``sinks.parquet.write_sequences`` for the full note.

    Scale shape — the token stream is never materialized row-per-token:

    1. per-document exclusive global token offsets via the distributed
       prefix scan (``scan.grouped_prev_cumsum`` on a constant key — range
       partitioned, int64-exact, no single-task window);
    2. each document emits only its BOUNDARY-CROSSING PIECES: one row per
       sequence it overlaps (``sequence(first_seq, last_seq)`` +
       ``slice``), so piece volume is docs + total_tokens/seq_len, not
       total_tokens;
    3. one groupBy(seq_id) reassembles pieces with an array_sort on the
       absolute start — uniform keys, map-side combine.
    """
    from . import scan

    if int(seq_len) <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = int(seq_len)
    if eos_token is not None:
        if eos_token == "" or any(ch.isspace() for ch in eos_token):
            raise ValueError("eos_token must be a non-empty whitespace-free token")
    toks = textops.tokens(F.coalesce(F.col(text_col), F.lit("")))
    if eos_token is not None:
        toks = F.concat(toks, F.array(F.lit(eos_token)))
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("__n"),
    ).withColumn("__g", F.lit(0))
    off = scan.grouped_prev_cumsum(
        base, "__g", [F.col(id_col).asc()], F.col("__n"), "__off"
    )
    first_seq = F.floor(F.col("__off") / L).cast("long")
    last_seq = F.floor((F.col("__off") + F.col("__n") - 1) / L).cast("long")
    piece = F.explode(
        F.transform(
            F.sequence(first_seq, last_seq),
            lambda s: F.struct(
                s.cast("long").alias("seq_id"),
                F.greatest(s * L, F.col("__off")).alias("abs_start"),
                F.slice(
                    F.col("__toks"),
                    (F.greatest(s * L, F.col("__off")) - F.col("__off") + 1).cast("int"),
                    (
                        F.least((s + 1) * L, F.col("__off") + F.col("__n"))
                        - F.greatest(s * L, F.col("__off"))
                    ).cast("int"),
                ).alias("piece"),
            ),
        )
    )
    pieces = off.select(piece.alias("__p")).select(
        F.col("__p.seq_id").alias("seq_id"),
        F.col("__p.abs_start").alias("__abs"),
        F.col("__p.piece").alias("__piece"),
    )
    return pieces.groupBy("seq_id").agg(
        F.sum(F.size("__piece")).cast("long").alias("n_tokens"),
        F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("__abs"), F.col("__piece")))),
                    lambda x: x["__piece"],
                )
            ),
        ).alias("text"),
    )
