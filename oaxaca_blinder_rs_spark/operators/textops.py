"""Text-analysis operators for large-scale training-data pipelines.

These are net-new, Spark-first additions beyond the reference's surface
(BASELINE.json north star): language-ID, quality scoring, token counting and
document fingerprinting over a `documents(doc_id, text, ...)` table.

Everything here is pure Catalyst expressions (no Python UDFs): at 100 TB these
run inside whole-stage codegen with full predicate pushdown, and the only
shuffle is whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "adaptive_logprob_filter",
    "lang_id",
    "fingerprint",
    "winnow_fingerprints",
    "ngram_doc_freq",
    "tfidf_top_terms",
    "text_stats",
    "token_count_bpe",
    "pii_scrub",
    "pii_stats",
    "blocklist_stats",
    "blocklist_filter",
    "tokenizer_fertility",
    "repetition_stats",
    "ngram_logprob",
    "kneser_ney_logprob",
    "script_ratios",
    "script_id",
    "vocab_sketches",
    "vocab_estimate",
    "bpe_train_merges",
    "bpe_encode",
    "bpe_token_ids",
    "SCRIPTS",
    "EN_STOPWORDS",
    "STOPSETS",
    "BPE_SPLIT_RE",
    "PII_PATTERNS",
    "boilerplate_line_stats",
    "remove_boilerplate_lines",
    "dedup_lines_in_doc",
    "zipf_fit",
    "pmi_bigrams",
]

EN_STOPWORDS = [
    "the", "and", "of", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

STOPSETS: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que"],
}


def _spread_carve_input(df: DataFrame) -> DataFrame:
    """r14 OPT (guide §2.5 input skew): a single-split input serializes a
    heavy map-side pass (tokenize/explode/regex carve) onto one core before
    any exchange spreads it. Round-robin repartition to the default
    parallelism when the input has fewer splits than min(parallelism, 8).
    Partitioning only — callers' downstream quantities are keyed
    aggregations or per-row projections, invariant to layout. At real
    corpus scale the scan has many splits and this never fires; the `.rdd`
    probe is free on the raw scans the contract queries pass."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(par, 8):
        df = df.repartition(par)
    return df


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the convention shared with the DuckDB oracle)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer pattern, restricted to the syntax shared by Java
# regex (Spark codegen) and RE2 (DuckDB): contractions, letter runs, digit
# runs, symbol runs — each with an optional leading space. No lookarounds, so
# both engines produce the identical match sequence and count.
BPE_SPLIT_RE = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches in the text.

    The approximation LLM-data pipelines use when the real tokenizer is too
    expensive for a first pass — the GPT-2 split regex counts within ~10% of
    true BPE token counts on English text. Pure codegen (``regexp_count``),
    no Python in the loop.
    """
    return F.regexp_count(text, F.lit(BPE_SPLIT_RE))


# (label, pattern, replacement) applied in order: emails first (their dotted
# domains would otherwise be eaten by the IP pattern), then IPv4, then
# international phone numbers. Patterns are Java-regex/RE2-portable.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d \-]{7,}\d", "<PHONE>"),
]


def pii_scrub(text: Column) -> Column:
    """Redact emails, IPv4 addresses and phone numbers with typed placeholders.

    Sequential ``regexp_replace`` chain — one codegen expression, applied in
    the PII_PATTERNS order so overlapping matches resolve deterministically.
    """
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts + scrubbed-text digest: the audit frame a
    redaction pass emits before dropping raw text."""
    t = F.col(text_col)
    cols = [F.col(id_col)]
    for label, pat, _ in PII_PATTERNS:
        cols.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{label}"))
    cols.append(F.md5(pii_scrub(t)).alias("scrubbed_md5"))
    return df.select(*cols)


def _ngrams_all(text: Column, n: int) -> Column:
    """All word n-grams in order (with repeats — unlike dedup.shingles)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), cnt - F.lit(n))
    return F.when(
        cnt >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array())


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition signals per document:

    - ``n_ngrams``: total word n-gram occurrences,
    - ``top_frac``: occurrences of the single most frequent n-gram / total
      (Gopher's "top n-gram fraction" filter),
    - ``dup_frac``: fraction of occurrences whose n-gram appears more than
      once (Gopher's "duplicate n-gram fraction").

    Shape: one explode + two keyed aggregations — both keys ((doc, gram) then
    doc) are high-cardinality and uniform, so the plan is two map-side-combine
    shuffles that hold at corpus scale; no per-doc window, no Python.
    """
    grams = _spread_carve_input(df).select(
        F.col(id_col), F.explode(_ngrams_all(F.col(text_col), n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_frac"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)) / F.sum("c"), 6
        ).alias("dup_frac"),
    )


def _token_arrays(df: DataFrame, text_col: str, id_col: str):
    """(doc_id, token array) materialized ONCE per invocation
    (localCheckpoint): the logprob operators reference their token stream
    from several aggregation branches, and without materialization Spark
    re-runs the regex split/lower tokenization of the whole corpus once per
    branch (guide §1.2). Returns (frame, array column). localCheckpoint —
    not persist — so lineage truncates and the materialized rows are GC'd
    with the frame; nothing survives the invocation."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tab = df.select(F.col(id_col), toks.alias("__toks")).localCheckpoint()
    return tab, F.col("__toks")


def ngram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document mean bigram log-probability under an add-alpha-smoothed
    bigram LM trained on the corpus itself: (id, n_bigrams, mean_logprob).

    The CCNet-style LM quality filter: documents whose token transitions
    are improbable under the corpus LM (gibberish, boilerplate soup, wrong
    language) score low; fluent text scores high. Scoring a corpus under a
    reference corpus's LM = train on one frame, score the other (the counts
    are plain aggregations, so both directions compose).

    Shape: one explode (doc, w1, w2) -> bigram + unigram count aggregations
    on uniform token keys -> two joins back -> per-doc average. All codegen;
    the LM "model" never materializes outside the shuffle. Deterministic
    (round 6) and fully SQL-expressible for the oracle.

    The tokenized per-doc array table is localCheckpoint-ed once: `big` is
    referenced by both the model counts and the scoring join and `uni` by
    the vocab total and the scoring join, and Spark re-executes shared
    subtrees per reference — without the materialization the regex
    split/lower tokenization of the full corpus ran 4x per invocation
    (guide §1.2 "don't compute things you throw away"; measured in
    OPTIMIZATION_r14.md). Per-invocation only — nothing persists across
    runs.
    """
    toks_tab, tarr = _token_arrays(df, text_col, id_col)
    cnt = F.size(tarr)
    idx = F.sequence(F.lit(0), cnt - F.lit(2))
    big = toks_tab.select(
        F.col(id_col),
        F.explode(
            F.when(
                cnt >= 2,
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(tarr, i + 1).alias("w1"),
                        F.element_at(tarr, i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    uni = (
        toks_tab.select(F.explode(tarr).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint()
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    bg_counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))

    a = float(alpha)
    scored = (
        big.join(bg_counts, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__lp",
            F.log((F.col("c12") + F.lit(a)) / (F.col("c1") + F.lit(a) * F.col("v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
    )


def adaptive_logprob_filter(
    df: DataFrame,
    frac: float = 0.5,
    by_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-group adaptive LM-quality gate: keep the top ``frac`` of documents
    in each ``by_col`` group by mean bigram logprob (CCNet-style per-language
    perplexity buckets — a fixed global cutoff over- or under-filters
    whichever language the LM fits worst).

    100 TB shape: score with ngram_logprob (keyed aggregations), reduce each
    group to ONE exact type-7 percentile threshold (a scalar agg — never a
    per-group window sort, which would funnel each language through a single
    task), then broadcast the |groups|-row threshold table back over the
    scores. Keeps docs with score >= threshold, so the kept fraction is
    >= frac under score ties.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    # one row per doc, 3 narrow columns — materialize so the threshold
    # aggregate and the keep filter share ONE ngram_logprob evaluation
    # instead of re-running the whole LM scoring pipeline per reference
    # (guide §1.2; before/after in OPTIMIZATION_r14.md)
    sc = df.select(id_col, by_col).join(
        ngram_logprob(df, text_col=text_col, id_col=id_col, alpha=alpha), id_col
    ).localCheckpoint()
    thr = sc.groupBy(by_col).agg(
        F.percentile("mean_logprob", F.lit(1.0 - float(frac))).alias("__thr")
    )
    return (
        sc.join(F.broadcast(thr), by_col)
        .filter(F.col("mean_logprob") >= F.col("__thr"))
        .select(id_col, by_col, "mean_logprob")
    )


def vocab_sketches(
    df: DataFrame,
    text_col: str = "text",
    shard_col: Column | None = None,
) -> DataFrame:
    """Per-shard HyperLogLog vocabulary sketches: (shard, sketch binary).

    The 100 TB way to track vocabulary size: each shard/partition/day keeps
    a fixed-size mergeable sketch (Spark's Datasketches HLL), and ANY
    subset's distinct-token estimate is one `hll_union_agg` away — no
    re-scan of the text. Default sharding is the physical partition id;
    pass e.g. a date column to keep one sketch per ingest day.
    """
    toks = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__w")
    shard = shard_col if shard_col is not None else F.spark_partition_id()
    return (
        df.select(shard.alias("shard"), toks)
        .groupBy("shard")
        .agg(F.hll_sketch_agg("__w").alias("sketch"))
    )


def vocab_estimate(sketches: DataFrame) -> int:
    """Union a sketch frame (any subset of shards) into one distinct-token
    estimate."""
    row = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).first()
    return int(row["est"] or 0)


# Unicode scripts the detector votes over. Java regex spells the class
# \p{IsLatin}, RE2 (DuckDB) spells it \p{Latin} — semantically identical;
# the oracle uses its own dialect and the counts hash-match.
SCRIPTS = ["Latin", "Cyrillic", "Han", "Arabic", "Greek"]


def _script_count(text: Column, script: str) -> Column:
    return F.length(F.regexp_replace(text, rf"[^\p{{Is{script}}}]", ""))


def script_ratios(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra: list[Column] | None = None,
) -> DataFrame:
    """Per-document Unicode-script composition: (id, n_letters, r_latin,
    r_cyrillic, r_han, r_arabic, r_greek), each ratio = script letters /
    all letters (6 dp).

    The first stage of multilingual corpus routing — script is cheaper and
    more robust than token-level language ID, and mixed-script documents
    (spam, code dumps, mojibake) show up as split ratios. Pure codegen
    regexp counts; zero shuffles.

    ``extra``: additional column expressions over ``df`` appended to the
    output (e.g. ``script_id(...)``) — computing companions in the SAME
    projection lets codegen share the per-script regexp counts and avoids a
    join-by-id second scan (guide §2.4; the r14 q_script_ratios shape).
    """
    t = F.col(text_col)
    n_letters = F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
    cols = [F.col(id_col), n_letters.alias("n_letters")]
    for s in SCRIPTS:
        ratio = F.when(
            n_letters > 0,
            F.round(_script_count(t, s).cast("double") / n_letters, 6),
        ).otherwise(F.lit(0.0))
        cols.append(ratio.alias(f"r_{s.lower()}"))
    if extra:
        cols.extend(extra)
    return df.select(*cols)


def script_id(text: Column, min_ratio: float = 0.5) -> Column:
    """Dominant script name (lowercase) when it holds more than
    ``min_ratio`` of the letters, else 'mixed'; 'und' when no letters."""
    n_letters = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    # r14 OPT: argmax via array_max over (count, -list_index, name) structs.
    # The previous when(c > best.c, item).otherwise(best) fold embedded the
    # whole running `best` tree TWICE per script — 2^|SCRIPTS| copies of the
    # first regexp count in the analyzed expression — which blew up per-row
    # work when callers put script_id in the same projection as the ratio
    # columns. Struct ordering compares c first, then -index, so ties keep
    # the FIRST script in SCRIPTS order: the identical decision rule.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _script_count(text, s).alias("c"),
                    F.lit(-i).alias("p"),
                    F.lit(s.lower()).alias("name"),
                )
                for i, s in enumerate(SCRIPTS)
            ]
        )
    )
    return (
        F.when(n_letters == 0, F.lit("und"))
        .when(best["c"].cast("double") / n_letters > float(min_ratio), best["name"])
        .otherwise(F.lit("mixed"))
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return n_punct.cast("double") / F.length(text).cast("double")


def _in_set_count(toks: Column, words: list[str]) -> Column:
    # r12: isin, not array_contains(literal array) — Catalyst rewrites a
    # literal IN list to InSet (one hash-set probe per token) while
    # array_contains scans the array linearly per token. Identical values
    # (verified by full-table collect equality at sf0.1 and the oracle
    # sweep); measured ~20% off the corpus_prepare gate stage.
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    n = F.size(toks)
    hits = _in_set_count(toks, stopwords or EN_STOPWORDS)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score: length, punctuation presence, stopword
    density, mean token length in a sane band. Mirrors common LLM-data
    pipeline filters (Gopher/C4-style rules), expressed as one Catalyst
    expression."""
    n_chars = F.length(text).cast("double")
    n_toks = token_count(text).cast("double")
    mean_tok_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    len_ok = F.when((n_chars >= 200) & (n_chars <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    sw_ok = F.when(sw >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) > 0.0, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + tok_ok + sw_ok + punct_ok) / F.lit(4.0)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over {en, de, fr, es}; 'und' if no votes.

    n-gram-free heuristic (container has no langid libs); deterministic and
    whole-stage-codegen friendly.
    """
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scores = {lang: _in_set_count(toks, words) for lang, words in STOPSETS.items()}
    # argmax with deterministic tie-break on language code order
    best = None
    for lang in sorted(STOPSETS):
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best["score"], F.struct(s.alias("score"), F.lit(lang).alias("lang"))).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, width: int = 16) -> Column:
    """Deterministic document fingerprint: md5 prefix (shared with oracle)."""
    return F.substring(F.md5(text), 1, width)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats frame: the 'document quality table' of the pipeline."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_computed"),
        token_count(t).alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("en_stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality_score"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )




def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (MOSS-style rolling-hash selection):
    (doc_id, fps array<bigint>).

    Char k-gram polynomial hashes mod P over the lowercased/trimmed text,
    then the distinct minima of each w-hash window — the winnowing
    guarantee: any shared substring of length >= k + w - 1 produces a
    shared fingerprint. Exact integer arithmetic (per-position mod-P power
    constants), so DuckDB and NumPy reproduce every value bit-for-bit.

    Kernel note: this is an Arrow-batched NumPy kernel (sliding-window
    convolution + window minima), not a codegen array expression — the
    equivalent nested higher-order-function expression falls off Spark's
    interpreted-lambda path and evaluates orders of magnitude slower than
    this vectorized form (measured: 64 s vs <1 s on 30 contract docs).
    Text shorter than k + w - 1 chars yields an empty array.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    B, P = 257, 1000003
    pows = np.array([pow(B, k - 1 - j, P) for j in range(k)], dtype=np.int64)
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("fps", ArrayType(LongType()), False),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, fps = [], []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                s = (s or "").strip().lower()
                if len(s) < k + w - 1:
                    ids.append(did)
                    fps.append([])
                    continue
                codes = np.fromiter(map(ord, s), dtype=np.int64, count=len(s))
                win = np.lib.stride_tricks.sliding_window_view(codes, k)
                h = (win @ pows) % P
                mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
                ids.append(did)
                fps.append([int(v) for v in np.unique(mins)])
            yield pd.DataFrame({"doc_id": ids, "fps": fps})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)


def ngram_doc_freq(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
    top_n: int = 50,
) -> DataFrame:
    """Corpus n-gram document frequencies: the IDF building block and the
    standard vocabulary-health report for a training corpus.

    Per-doc DISTINCT word k-shingles (dedup.shingles) exploded and counted:
    df(g) = number of documents containing g. One explode + one count
    shuffle keyed on the n-gram (uniform), then a top-n with a total
    (df desc, ngram asc) order so the cut is deterministic and
    oracle-comparable.
    """
    from .dedup import shingles

    return (
        _spread_carve_input(df)
        .select(F.explode(shingles(F.col(text_col), k)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("ngram").asc())
        .limit(int(top_n))
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Per-group vocabulary health report: the corpus-analysis stage a
    training-data pipeline runs per source/shard before mixing.

    One row per ``by`` value: n_tokens (total whitespace tokens), n_types
    (distinct lowercased tokens), type_token_ratio, hapax_frac (share of
    types occurring exactly once — the Zipf tail mass; mojibake and
    boilerplate shift it in opposite directions), top_token (most frequent,
    ties by token ascending) and top_frac (its share of all tokens — the
    Zipf head; a degenerate source shows top_frac >> 1/rank expectations).

    Scale shape: one codegen explode + two keyed groupBys — (by, token)
    counts then per-``by`` aggregates — both partial-aggregated map-side;
    the (by, token) key is near-uniform so no skew handling is needed.
    Mergeable across shards at the (by, token) level. No reference
    analogue (net-new LLM-pipeline surface).
    """
    tok = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__tok")
    counts = (
        df.select(F.col(by), tok)
        .filter(F.col("__tok") != "")
        .groupBy(by, "__tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return (
        counts.groupBy(by)
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum((F.col("__cnt") == 1).cast("long")).alias("hapax_types"),
            # top token = lexicographically-first among max-count tokens:
            # min over (-cnt, token) structs, one aggregate, no window
            F.min(
                F.struct((-F.col("__cnt")).alias("nc"), F.col("__tok").alias("t"))
            ).alias("__top"),
        )
        .select(
            F.col(by),
            F.col("n_tokens"),
            F.col("n_types"),
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias(
                "type_token_ratio"
            ),
            F.round(
                F.col("hapax_types").cast("double") / F.col("n_types"), 6
            ).alias("hapax_frac"),
            F.col("__top.t").alias("top_token"),
            F.round((-F.col("__top.nc")).cast("double") / F.col("n_tokens"), 6).alias(
                "top_frac"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, score).

    tf = term count within the doc; idf = ln(N / df) with df = number of
    docs containing the term; score rounded to 6 decimals with a (score
    desc, term asc) cut so the per-doc top-k is deterministic. Two count
    shuffles (term-in-doc, then term) and a per-doc window — every key is
    high-cardinality, nothing funnels. Pass ``n_docs`` to skip the count
    job when the corpus size is already known.
    """
    from pyspark.sql import Window

    N = float(n_docs if n_docs is not None else df.count())
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    terms = _spread_carve_input(df).select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.round(F.col("tf") * F.log(F.lit(N) / F.col("df")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(top_k))
        .select(id_col, "term", "score")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query terms:
    (doc_id, score) — the retrieval-quality ranking a training-data search
    / curation UI runs over the corpus (Robertson & Walker 1994).

    score = sum over query terms of
      idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (the non-negative Lucene
    form). Terms are lowercase whitespace tokens — the same tokenizer as
    every other text operator, so scores compose with tf-idf/dedup stats.

    Scale shape: the corpus explodes once to (doc, term, tf) filtered TO
    QUERY TERMS ONLY (the filter prunes before the count shuffle); doc
    lengths come from one map-side length projection; df per query term is
    a |q|-row aggregate broadcast back. Nothing keyed lower than doc id
    ever shuffles. Deterministic (score rounded 6dp, doc id tie-break)
    ``top_n`` cut when requested.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]
    N = float(n_docs if n_docs is not None else df.count())
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__t"))
    dl = base.select(F.col(id_col), F.size("__t").alias("__dl"))
    avgdl = dl.agg(F.avg("__dl").alias("__avgdl"))
    terms = (
        base.select(F.col(id_col), F.explode("__t").alias("term"))
        .filter(F.col("term").isin(q))
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(N) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "__s",
            idf
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    if top_n is not None:
        scored = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(int(top_n))
    return scored


def normalize_text(
    text: Column,
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
) -> Column:
    """Canonical text cleaning — the first stage of every ingest pipeline:
    strip C0/C1 control characters (except the whitespace the collapse
    step handles), collapse whitespace runs to single spaces, trim, and
    optionally lowercase. Pure regexp_replace chain (codegen, map-only);
    each regex uses only literal character classes, so Java and RE2
    evaluate them identically — the same engine-parity contract the PII
    scrubber relies on."""
    out = text
    if strip_control:
        out = F.regexp_replace(out, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, "\\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out


def _merge_fold_step(rules):
    """Fold step for greedy left-to-right application of a SYMBOL-DISJOINT
    merge-rule batch: append x, except when the accumulator tail is an
    unconsumed l_i and x == r_i, in which case replace the tail with the
    merged token. Disjoint rules can neither create nor consume each
    other's symbols, so at most one branch fires per step and one fold
    pass equals sequential per-rule passes (the argument on
    ``_select_merge_batch`` / ``_apply_merges``). ``rules`` items are
    (l, r, ...) — extra fields ignored."""

    def fold_step(acc, x):
        expr = F.concat(acc, F.array(x))
        for rule in rules:
            l, r = rule[0], rule[1]
            expr = F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(l + r)),
                ),
            ).otherwise(expr)
        return expr

    return fold_step


def _select_merge_batch(cands, f_floor, limit):
    """Maximal prefix of the sorted pair-candidate list that provably
    matches one-merge-at-a-time greedy BPE when applied as a single batch.

    ``cands`` is the top of the pair-count table in greedy order
    (freq DESC, left ASC, right ASC); ``f_floor`` is an upper bound on the
    frequency of every pair NOT in the list (the last listed freq when the
    list was truncated, else 0). The batch takes candidates in order and
    stops at the first that violates either safety condition:

    1. *Symbol disjointness* (including merged tokens): candidate symbols
       {l, r, l+r} must not intersect any earlier member's. Disjoint rules
       can neither create nor destroy each other's matches, so their
       counts and their one-fold application are exactly sequential.
    2. *Creation ceiling*: the candidate's freq must strictly exceed an
       upper bound on the updated count of ANY pair an earlier member's
       application can touch. For member (l, r, f) with t = l+r, every
       touched pair involves a symbol of {l, r, t}; its original count is
       at most c = max(freq of any listed pair sharing one of those
       symbols, f_floor) — nothing ranked above an accepted member can
       conflict with it, because the batch is a *prefix* (it would have
       been accepted or would have ended the batch). Creation is bounded
       by consumption: new (x,t)/(t,y) adjacencies each replace an
       (x,l)/(r,y) adjacency (count <= c), and (t,t) adjacencies each
       consume an (r,l) bridge (count <= c; for l == r the bridge is the
       member itself, count <= ceil(f/2) by run parity). So updated
       counts are <= 2c, or <= c + ceil(f/2) when l == r. Pairs members
       only *destroy* can't climb the order, and the members themselves
       fold to count 0.

    Under 1+2 the i-th member is exactly what step-i greedy would pick:
    everything ranked above it is an earlier member (count now 0), its
    own count is untouched, unmodified pairs keep their original rank
    below it, and every modified count sits strictly under its freq.
    Ties with modified pairs are impossible because condition 2 is
    strict, and pairs outside the list rank below the whole list.
    """
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    ceiling = -1
    for l, r, f in cands:
        if len(batch) >= limit:
            break
        t = l + r
        if batch:
            if used & {l, r, t}:
                break
            if f <= ceiling:
                break
        batch.append((l, r, f))
        syms = {l, r, t}
        used |= syms
        c = f_floor
        for l2, r2, f2 in cands:
            if (l2, r2) != (l, r) and (l2 in syms or r2 in syms):
                c = max(c, f2)
        bound = 2 * c
        if l == r:
            bound = max(bound, c + (f + 1) // 2)
        ceiling = max(ceiling, bound)
    return batch


def bpe_train_merges(
    df: DataFrame,
    k_merges: int = 4,
    text_col: str = "text",
    return_vocab: bool = False,
    candidate_window: int = 512,
):
    """Distributed BPE tokenizer training: learn the first ``k_merges``
    merge rules (Sennrich et al. 2016) over a corpus.

    Returns the merge table — (rank, left, right, freq) — the artifact a
    tokenizer-training pipeline ships: rank r is the r-th most frequent
    adjacent symbol pair (ties by (left, right) ascending, so the rule
    sequence is deterministic and oracle-comparable), learned greedily
    with each word's symbol sequence re-segmented after every merge.

    Algorithm (the standard one, distributed): (1) ONE pass builds the
    word-frequency table — lowercased whitespace words with counts and an
    appended end-of-word marker '</w>'; every later stage runs on this
    DISTINCT-WORD table, whose size is the vocabulary, not the corpus, so
    a 100 TB corpus pays one token-count shuffle and then iterates over
    megabytes. (2) Per ROUND (r9: batched rounds — the real-vocab scale
    axis, where k is 32k merges and one Spark job per merge is the
    bottleneck): adjacent pairs via one codegen transform+explode, a
    count-weighted groupBy (partial-agg map-side), ONE driver collect of
    the top ``candidate_window`` candidates in greedy order, a
    driver-side selection of the maximal batch that PROVABLY matches
    one-at-a-time greedy (symbol-disjoint prefix under a strict creation
    ceiling — the full argument is on ``_select_merge_batch``), and one
    codegen left-to-right fold (F.aggregate) applying the whole batch
    ("aaa" + (a,a) -> "(aa)a", the standard greedy non-overlap; disjoint
    rules in one fold are exactly sequential application). Job count
    drops from k to ~k/batch with bit-identical output; a batch is never
    empty (the head candidate is always safe), so progress is guaranteed
    and the worst case degrades to the r8 one-merge-per-job behavior.
    Pair counting is the standard overlapping zip (s[i], s[i+1]).

    With ``return_vocab=True`` returns ``(merges, vocab)`` where vocab is
    the segmented vocabulary after all learned merges — one row per
    distinct word: (w, cnt, tokens array<string>), the apply-side artifact.

    The reference engine has no tokenizer surface (net-new LLM-pipeline
    op); the DuckDB oracle replays every stage with an independent
    merge construction (position-parity run splitting instead of a fold).
    """
    if k_merges < 1:
        raise ValueError(f"k_merges must be >= 1, got {k_merges}")
    spark = df.sparkSession

    word = F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("w")
    words = (
        df.select(word)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # symbol sequence: characters plus the end-of-word marker
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.col("w").substr(i, F.lit(1))
    )
    seqs = words.select(
        "w", "cnt", F.concat(chars, F.array(F.lit("</w>"))).alias("syms")
    ).localCheckpoint()

    if candidate_window < 1:
        raise ValueError(f"candidate_window must be >= 1, got {candidate_window}")
    merges = []
    while len(merges) < int(k_merges):
        pairs = seqs.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(int(candidate_window))
            .collect()
        )
        if not top:
            break
        cands = [(row["l"], row["r"], int(row["freq"])) for row in top]
        # pairs beyond a truncated list are bounded by the last listed
        # freq; a complete list bounds them at 0
        f_floor = cands[-1][2] if len(cands) == int(candidate_window) else 0
        batch = _select_merge_batch(
            cands, f_floor, limit=int(k_merges) - len(merges)
        )
        base = len(merges)
        merges.extend(
            (base + i + 1, l, r, f) for i, (l, r, f) in enumerate(batch)
        )
        # greedy left-to-right application of the WHOLE batch in one
        # fold: merge rule i whenever the accumulator's tail is an
        # UNCONSUMED l_i; rules are symbol-disjoint, so at most one
        # branch can fire per step and the fold equals sequential
        # per-rule application
        folded = F.aggregate(
            "syms", F.array().cast("array<string>"), _merge_fold_step(batch)
        )
        # localCheckpoint (eager), not persist: it BOTH materializes the
        # round's result and TRUNCATES the logical plan — with hundreds
        # of rounds of nested fold expressions an un-truncated lineage
        # grows superlinearly and the analyzer/plan-string work ends in
        # driver OOM long before 32k merges (observed at k=64 in the
        # suite). Old checkpoint blocks are released by the context
        # cleaner once unreferenced.
        seqs = seqs.select("w", "cnt", folded.alias("syms")).localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, freq long"
    )
    if return_vocab:
        # the segmented vocabulary after all learned merges — the
        # train->apply artifact pair a tokenizer pipeline ships
        vocab = seqs.select("w", "cnt", F.col("syms").alias("tokens"))
        return merges_df, vocab
    return merges_df


def _apply_merges(seqs: DataFrame, rules: list) -> DataFrame:
    """Apply an ordered BPE merge-rule list to a word table carrying a
    ``syms array<string>`` column — the Sennrich APPLY side: one greedy
    left-to-right pass per rule, in rank order.

    Consecutive rules whose symbol sets {l, r, l+r} are pairwise disjoint
    batch into a single codegen fold: a disjoint rule can neither create
    nor destroy another's (l, r) adjacency (merging replaces two tokens
    with one, so outside neighbours never become adjacent), and rank order
    guarantees an earlier rule never mentions a later rule's merged token
    (in training, a token exists only after its rule), so one fold pass
    over the batch is exactly the sequential passes. The plan is truncated
    per batch (localCheckpoint) — same lineage discipline as training.

    ``rules`` items are (l, r) or (rank, l, r, ...) rows/tuples.
    """
    norm = []
    for it in rules:
        vals = list(it)
        if len(vals) >= 3 and isinstance(vals[0], int):
            norm.append((vals[1], vals[2]))
        else:
            norm.append((vals[0], vals[1]))
    other = [c for c in seqs.columns if c != "syms"]
    i, n = 0, len(norm)
    while i < n:
        batch: list = []
        used: set = set()
        while i < n:
            l, r = norm[i]
            t = l + r
            if batch and used & {l, r, t}:
                break
            batch.append((l, r))
            used |= {l, r, t}
            i += 1
        folded = F.aggregate(
            "syms", F.array().cast("array<string>"), _merge_fold_step(batch)
        )
        seqs = seqs.select(*other, folded.alias("syms")).localCheckpoint()
    return seqs


def bpe_encode(
    df: DataFrame,
    vocab: DataFrame,
    merges: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov: str = "apply",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode documents with a trained BPE tokenizer — the APPLY side of
    ``bpe_train_merges`` (net-new LLM-pipeline op; the reference engine has
    no tokenizer surface). Completes the train -> encode -> pack story:
    the output's ``n_tokens`` feeds ``corpus.pack_token_shards`` directly.

    ``vocab`` is the segmented vocabulary (w, cnt, tokens) from
    ``bpe_train_merges(return_vocab=True)``. Each document lowercases and
    whitespace-splits exactly like training, looks every word up in the
    vocabulary, and concatenates the per-word token lists in word order.

    Out-of-vocabulary words (encoding NEW text with a frozen tokenizer):
      - ``oov='apply'`` (default): char-split + '</w>' then the learned
        ``merges`` applied in rank order (``_apply_merges``) — the exact
        Sennrich apply; requires ``merges``. The OOV table is DISTINCT
        words, so the merge replay costs vocabulary-scale jobs, not
        corpus-scale.
      - ``oov='chars'``: char-split + '</w>' with no merges (a documented
        degradation when the merge table wasn't shipped).
      - ``oov='skip'``: inner-join semantics — unknown words drop. The
        right mode when encode corpus == training corpus (zero OOV by
        construction) since it schedules no OOV jobs at all.

    Returns (id_col, tokens array<string>, n_tokens int); documents whose
    text contains no words are absent (no token rows to aggregate — the
    convention every explode-based text operator here shares).

    Scale shape: the vocabulary is broadcast (vocabulary-sized — megabytes
    against a 100 TB corpus); the only corpus-sized shuffle is the final
    groupBy(doc) re-assembly of per-word segments, the same cost class as
    chunk_documents. Everything else is codegen map work.
    """
    if oov not in ("apply", "chars", "skip"):
        raise ValueError(f"oov must be 'apply', 'chars' or 'skip', got {oov!r}")
    pos_words = (
        df.select(
            F.col(id_col),
            F.posexplode(tokens(F.lower(F.trim(F.col(text_col))))).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    seg = vocab.select("w", F.col("tokens").alias("__toks"))
    if oov != "skip":
        oov_words = (
            pos_words.select("w").distinct().join(seg.select("w"), "w", "left_anti")
        )
        chars = F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        )
        oov_seqs = oov_words.select(
            "w", F.concat(chars, F.array(F.lit("</w>"))).alias("syms")
        )
        if oov == "apply":
            if merges is None:
                raise ValueError("oov='apply' requires the merges table")
            rules = [
                (r["left"], r["right"])
                for r in merges.orderBy("rank").collect()
            ]
            if rules:
                oov_seqs = _apply_merges(oov_seqs, rules)
        seg = seg.unionByName(oov_seqs.select("w", F.col("syms").alias("__toks")))
    # the vocabulary is megabytes against a corpus at any realistic scale;
    # broadcast_vocab=False falls back to a shuffle join for the rare
    # pathological vocabulary that exceeds executor memory
    joined = pos_words.join(F.broadcast(seg) if broadcast_vocab else seg, "w")
    enc = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "__toks"))).alias("__st")
    )
    return enc.select(
        F.col(id_col),
        F.flatten(F.transform("__st", lambda s: s["__toks"])).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def bpe_token_ids(vocab: DataFrame) -> DataFrame:
    """Contiguous token-id table from a segmented vocabulary — the id
    assignment a tokenizer artifact ships next to its merge rules.

    Explodes each word's token list weighted by the word's corpus count,
    aggregates corpus frequency per distinct token, and assigns ids
    0..V-1 ordered (freq DESC, token ASC) — deterministic and
    oracle-comparable. The rank comes from the distributed prefix scan
    (``scan.ordered_prev_cumsum``), never a single-task global window: the
    token table is vocabulary-sized, but the no-SinglePartition discipline
    is uniform across the repo so the same code survives a 10M-entry
    vocabulary.

    Returns (token_id long, token string, freq long).
    """
    from .scan import ordered_prev_cumsum

    freqs = (
        vocab.select(F.explode("tokens").alias("token"), F.col("cnt"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )
    ranked = ordered_prev_cumsum(
        freqs,
        order=[F.col("freq").desc(), F.col("token").asc()],
        value=F.lit(1.0),
        out_col="__rk",
    )
    return ranked.select(
        F.col("__rk").cast("long").alias("token_id"), "token", "freq"
    )


def kneser_ney_logprob(
    df: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-probability under an INTERPOLATED
    KNESER-NEY LM trained on the corpus itself: (id, n_bigrams,
    mean_logprob) — the stronger sibling of the add-alpha ``ngram_logprob``
    filter (Kneser & Ney 1995; the smoothing KenLM-style corpus filters
    use). Absolute discounting with continuation-probability backoff:

        P(w2|w1) = (max(c(w1 w2) - D, 0)
                    + D * N1+(w1 *) * N1+(* w2) / N1+(* *)) / c(w1)

    where c(w1) is w1's CONTEXT total (sum of its bigram counts),
    N1+(w1 *) / N1+(* w2) are the distinct right/left neighbour counts and
    N1+(* *) the distinct bigram types — the continuation term scores how
    PROMISCUOUSLY a word appears in new contexts, which is what separates
    fluent text from boilerplate that repeats one high-frequency pattern.

    Tokenization, bigram carving, per-doc averaging and the 6-dp rounding
    all mirror ngram_logprob, so the two scores are drop-in comparable.
    Every model quantity is a plain count aggregation on uniform token
    keys (one explode, three keyed groupBys, joins back) — all codegen,
    fully SQL-expressible for the oracle; with 0 < D < 1 every observed
    bigram's probability is strictly positive.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    D = float(discount)
    # materialize the token arrays once (guide §1.2): `big` feeds both the
    # model counts and the scoring join, and bg_counts feeds FOUR branches
    # (ctx, cont, types, scoring join) — unmaterialized, the corpus was
    # re-tokenized 5x and the bigram groupBy re-ran 4x per invocation
    # (5 Scan+Generate subtrees in the before plan, OPTIMIZATION_r14.md)
    toks_tab, tarr = _token_arrays(df, text_col, id_col)
    cnt = F.size(tarr)
    idx = F.sequence(F.lit(0), cnt - F.lit(2))
    big = toks_tab.select(
        F.col(id_col),
        F.explode(
            F.when(
                cnt >= 2,
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(tarr, i + 1).alias("w1"),
                        F.element_at(tarr, i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    bg_counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    ).localCheckpoint()
    # per-context totals and distinct-successor counts; bg_counts is
    # distinct by construction, so count(*) IS N1+(w1 *)
    ctx = bg_counts.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n_fwd")
    )
    cont = bg_counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n_back"))
    types = bg_counts.agg(F.count(F.lit(1)).alias("n_types"))

    scored = (
        big.join(bg_counts, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "__lp",
            F.log(
                (
                    F.greatest(F.col("c12") - F.lit(D), F.lit(0.0))
                    + F.lit(D)
                    * F.col("n_fwd")
                    * F.col("n_back")
                    / F.col("n_types")
                )
                / F.col("c1")
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
    )


def blocklist_stats(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_literal_terms: int = 512,
) -> DataFrame:
    """Per-document banned-term statistics (the C4 "bad-words" gate shape;
    Raffel et al. 2020 §2.2 drop any page containing a blocklisted word).

    Matching is whole-token, case-folded, over the shared whitespace
    tokenization — substring matching would flag "class" for "ass", the
    classic blocklist false positive.

    Output: (id_col, n_hits, n_terms, kept) — total banned-token
    occurrences, distinct banned terms present, and the C4 keep decision
    (kept = no hits at all). Null text counts as clean.

    Scale shape, two regimes:
    - len(terms) <= max_literal_terms: the list compiles into the plan as a
      literal array and both counts are pure whole-stage codegen
      (size(filter(...)) / size(array_intersect(...))) — zero shuffle,
      zero Python, the list rides the serialized plan to every task.
    - bigger lists: explode tokens once and broadcast-hash-join the terms
      table (one shuffle for the per-doc groupBy; the terms side never
      shuffles). Same output, verified equal in tests.
    """
    norm = [t.lower() for t in terms]
    if len(set(norm)) != len(norm):
        raise ValueError("terms must be distinct after case-folding")
    if any(t == "" or t != t.strip() or any(ch.isspace() for ch in t) for t in norm):
        raise ValueError("terms must be non-empty single tokens")
    toks = tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    if len(norm) <= max_literal_terms:
        lit_terms = F.array(*[F.lit(t) for t in norm])
        return df.select(
            F.col(id_col),
            F.size(F.filter(toks, lambda t: F.array_contains(lit_terms, t))).alias("n_hits"),
            F.size(F.array_intersect(toks, lit_terms)).alias("n_terms"),
        ).withColumn("kept", F.col("n_hits") == 0)
    terms_df = df.sparkSession.createDataFrame([(t,) for t in norm], "term string")
    hits = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .join(F.broadcast(terms_df), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("term").alias("n_terms"),
        )
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
            F.coalesce("n_terms", F.lit(0)).cast("int").alias("n_terms"),
        )
        .withColumn("kept", F.col("n_hits") == 0)
    )


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
    max_literal_terms: int = 512,
) -> DataFrame:
    """Removal face: keep documents with at most ``max_hits`` banned-token
    occurrences (C4 semantics at the default 0). Returns the input rows
    unchanged — the stats stay internal, so the filter composes into
    corpus gates without schema noise.

    Term validation matches ``blocklist_stats`` exactly: a multi-word or
    whitespace-padded term can never match a whitespace token, so it would
    be a silent no-op in a SAFETY gate — both faces raise instead, in both
    regimes. ``max_literal_terms`` is the same regime knob blocklist_stats
    exposes (literal-array codegen up to the threshold, broadcast join
    above).

    Joins ANTI against the DROP set, not semi against the keep set: on a
    healthy corpus the drops are the rare side (C4 removed <1% of pages),
    so that side broadcasts while the keep set — most of the corpus —
    never shuffles. In the literal-terms regime the drop set needs no
    join at all: the predicate filters inline in the scan."""
    norm = sorted({t.lower() for t in terms})
    if any(t == "" or t != t.strip() or any(ch.isspace() for ch in t) for t in norm):
        raise ValueError("terms must be non-empty single tokens")
    if len(norm) <= max_literal_terms:
        # literal regime: n_hits is a pure expression over df's own columns —
        # no stats frame, no join; the predicate filters inline in the scan
        toks = tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        lit_terms = F.array(*[F.lit(t) for t in norm])
        n_hits = F.size(F.filter(toks, lambda t: F.array_contains(lit_terms, t)))
        return df.where(n_hits <= max_hits)
    stats = blocklist_stats(
        df, terms, text_col=text_col, id_col=id_col, max_literal_terms=max_literal_terms
    )
    drops = stats.where(F.col("n_hits") > max_hits).select(id_col)
    return df.join(F.broadcast(drops), id_col, "anti")


def tokenizer_fertility(
    df: DataFrame,
    by_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility report — the standard tokenizer-
    evaluation table (how many subword tokens a word costs, how many
    characters a token carries; multilingual pipelines watch fertility to
    spot languages a vocabulary serves badly).

    Per ``by_col`` group: document count, total whitespace words, total
    BPE-regex tokens (token_count_bpe — the GPT-2 pre-tokenizer count),
    fertility = bpe_tokens / words, chars_per_token = chars / bpe_tokens
    (6 dp, the oracle-shared rounding).

    Pure codegen counts + ONE keyed groupBy — nothing else shuffles.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    per_doc = df.select(
        F.col(by_col),
        token_count(t).alias("__w"),
        token_count_bpe(t).alias("__b"),
        F.length(t).alias("__c"),
    )
    return (
        per_doc.groupBy(by_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__w").cast("long").alias("n_words"),
            F.sum("__b").cast("long").alias("n_bpe_tokens"),
            # try_divide: a group of empty/whitespace docs has zero tokens —
            # NULL, not an ANSI divide-by-zero error (asserted in tests)
            F.round(F.try_divide(F.sum("__b"), F.sum("__w")), 6).alias("fertility"),
            F.round(F.try_divide(F.sum("__c"), F.sum("__b")), 6).alias("chars_per_token"),
        )
    )


def boilerplate_line_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by_col: str | None = "source",
    min_docs: int = 3,
) -> DataFrame:
    """Boilerplate line detection — the CCNet / RefinedWeb line-level rule:
    a line that appears verbatim in at least ``min_docs`` DISTINCT documents
    (within one ``by_col`` group — boilerplate is domain-local: nav bars,
    cookie banners, footers repeat within a site, not across the web) is
    boilerplate. Whitespace-only lines are never flagged: they appear
    everywhere and removing them is spacing surgery, not cleaning.

    Returns (by_col?, line, n_docs) for every flagged line. Scale shape:
    one explode over lines + one keyed (group, line) count-distinct — the
    heavy output is bounded by the number of distinct repeated lines, the
    small end of the funnel.
    """
    if int(min_docs) < 2:
        raise ValueError("min_docs must be >= 2")
    ls = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    keys = [F.col(by_col)] if by_col else []
    lines = docs.select(*keys, F.col(id_col), F.explode(ls).alias("line"))
    return (
        lines.where(F.trim(F.col("line")) != "")
        .groupBy(*([by_col] if by_col else []), "line")
        .agg(F.countDistinct(id_col).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= int(min_docs))
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by_col: str | None = "source",
    min_docs: int = 3,
) -> DataFrame:
    """Removal face of ``boilerplate_line_stats``: rewrite ``text_col`` with
    the flagged lines deleted, preserving the order (and the blank lines)
    of everything that survives. A document whose every line was flagged
    becomes the empty string — the caller's quality gate drops empties, the
    line surgeon doesn't make keep/drop decisions. Schema passes through
    with only ``text_col`` rewritten.

    Scale shape: the stats pass (one keyed count-distinct), an anti-join of
    the exploded lines against the flagged side (the RARE side — same
    reasoning as blocklist_filter's drop set), and one per-document
    groupBy that reassembles surviving lines via array_sort over
    (position, line) structs — no window, no global sort.
    """
    stats = boilerplate_line_stats(
        docs, text_col=text_col, id_col=id_col, by_col=by_col, min_docs=min_docs
    )
    ls = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    keys = [by_col] if by_col else []
    lines = docs.select(
        *[F.col(k) for k in keys],
        F.col(id_col),
        F.posexplode(ls).alias("__pos", "line"),
    )
    kept = lines.join(stats.select(*keys, "line"), [*keys, "line"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("__pos"), F.col("line")))),
                lambda x: x["line"],
            ),
        ).alias("__newtext")
    )
    return (
        docs.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__newtext"), F.lit("")))
        .drop("__newtext")
        .select(*docs.columns)
    )


def dedup_lines_in_doc(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INTRA-document repeated-line removal: within each document, keep only
    the first occurrence of every distinct line (Dolma/RefinedWeb run this
    beside the cross-document boilerplate pass — navigation menus, repeated
    headers and copy-paste artifacts repeat inside one page long before
    they repeat across pages). Order of the surviving lines is preserved;
    NULL text counts as empty. Schema passes through with only ``text_col``
    rewritten.

    Scale shape: pure whole-stage codegen, ZERO shuffle — the kept set is
    ``filter(lines, (x, i) -> array_position(lines, x) == i + 1)`` (a line
    survives iff its index IS the first index of its value), evaluated
    map-side per row. The membership probe is O(L) per line, so a document
    with L lines costs O(L^2) string compares in the JVM — fine up to
    many thousands of lines per doc; a pathological single-document
    transcript should go through ``remove_boilerplate_lines``'s
    explode+groupBy machinery instead (one shuffle, O(L log L)).
    """
    ls = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    kept = F.filter(ls, lambda x, i: F.array_position(ls, x) == i + F.lit(1))
    return _spread_carve_input(docs).withColumn(text_col, F.concat_ws("\n", kept))


def zipf_fit(
    df: DataFrame,
    top_n: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Zipf-law fit of the corpus token-frequency distribution: OLS of
    ln(freq) on ln(rank) over the ``top_n`` most frequent tokens — the
    one-number corpus health check (natural language sits near slope -1;
    boilerplate soup flattens the head, mojibake steepens the tail; a big
    drift in the slope between two crawls is a pipeline bug before it is a
    linguistics result).

    Returns one row: (n_types, n_tokens, top_n_used, zipf_slope,
    zipf_intercept). Tokens are the vocab_stats convention (lowercased
    whitespace tokens, empties dropped); ranks 1..top_n by (freq DESC,
    token ASC) — deterministic under ties.

    Scale shape: one explode + one token-keyed count groupBy (map-side
    combine, near-uniform key), the top-n cut via sort-limit
    (TakeOrderedAndProject — per-partition top-n, k-row driver merge,
    never a global sort), and the regression is a single aggregate over
    <= top_n rows (the row_number window runs post-limit on <= top_n rows,
    the sketches.py convention). The totals ride the same counts frame.
    """
    if int(top_n) < 2:
        raise ValueError(f"top_n must be >= 2, got {top_n}")
    tok = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__tok")
    counts = (
        df.select(tok)
        .filter(F.col("__tok") != "")
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .persist()
    )
    try:
        totals = counts.agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("__cnt").alias("n_tokens"),
        )
        top = counts.orderBy(F.col("__cnt").desc(), F.col("__tok").asc()).limit(int(top_n))
        w = Window.orderBy(F.col("__cnt").desc(), F.col("__tok").asc())
        ranked = top.withColumn("__rank", F.row_number().over(w))
        lx = F.log(F.col("__rank").cast("double"))
        ly = F.log(F.col("__cnt").cast("double"))
        fit = ranked.agg(
            F.count(F.lit(1)).alias("__m"),
            F.sum(lx).alias("__sx"),
            F.sum(ly).alias("__sy"),
            F.sum(lx * ly).alias("__sxy"),
            F.sum(lx * lx).alias("__sxx"),
        )
        slope = (F.col("__m") * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
            F.col("__m") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
        )
        intercept = (F.col("__sy") - slope * F.col("__sx")) / F.col("__m")
        out = totals.crossJoin(
            fit.select(
                F.col("__m").cast("long").alias("top_n_used"),
                slope.alias("zipf_slope"),
                intercept.alias("zipf_intercept"),
            )
        ).select("n_types", "n_tokens", "top_n_used", "zipf_slope", "zipf_intercept")
        # materialize before releasing the shared counts cache
        rows = out.collect()
        return df.sparkSession.createDataFrame(rows, out.schema)
    finally:
        counts.unpersist()


def pmi_bigrams(
    df: DataFrame,
    min_count: int = 5,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction: pointwise mutual information of adjacent
    token pairs — PMI(w1, w2) = ln( P(w1,w2) / (P(w1) P(w2)) ) with pair
    probability over the bigram total and unigram probabilities over the
    token total. The classic corpus-analysis face (Church & Hanks 1990):
    high-PMI pairs are multiword units ("new york"), and a drift in the
    top collocations between two crawls flags template soup the unigram
    stats miss. ``min_count`` drops the unstable rare-pair tail (PMI's
    known low-frequency pathology); ``top_n`` keeps the head by
    (pmi DESC, w1 ASC, w2 ASC) — deterministic under ties.

    Returns (w1, w2, n_pair, pmi). Tokens follow the vocab_stats
    convention (lowercased whitespace tokens; a document contributes
    len-1 adjacent pairs).

    Scale shape: two count groupBys on near-uniform token keys (map-side
    combine), two broadcast-scalar totals, two token-keyed joins to attach
    unigram counts, and the head cut is sort-limit
    (TakeOrderedAndProject) — no global sort, no window over data.
    """
    if int(min_count) < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if int(top_n) < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    # r14 OPT (guide §2.5 input skew): the tokenize+explode map side runs
    # once per consumer (bigram counts, bigram total, two unigram uses); on
    # a single-split input each pass serialized onto one core (~7 s each at
    # sf0.1). Partitioning only — every downstream quantity is an exact
    # integer count, invariant to layout. At real corpus scale the scan has
    # many splits and this never fires.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(par, 8):
        df = df.repartition(par)
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), cnt - F.lit(2))
    pairs = df.select(
        F.explode(
            F.when(
                cnt >= 2,
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(toks, i + 1).alias("w1"),
                        F.element_at(toks, i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("__bg")
    ).select(F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__cu"))
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
    )
    n_uni = uni.agg(F.sum("__cu").cast("double").alias("__nu"))
    n_big = pairs.agg(F.count(F.lit(1)).cast("double").alias("__nb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("__cu").alias("__c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("__cu").alias("__c2"))
    pmi = F.log(
        (F.col("n_pair") / F.col("__nb"))
        / ((F.col("__c1") / F.col("__nu")) * (F.col("__c2") / F.col("__nu")))
    )
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(int(top_n))
    )


def vocab_coverage(
    df: DataFrame,
    ks: list[int],
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve: for each requested k, the share of all
    token OCCURRENCES covered by the k most frequent types — the table a
    tokenizer vocab size is actually read off ("32k types cover 99.2% of
    the stream; the tail is UNK/byte-fallback territory").

    Types rank by (count desc, token asc) — deterministic under count
    ties. Returns one row per requested k: (k, rank = min(k, n_types),
    covered, total — exact int64 tallies — and coverage, one division of
    exact integers). k beyond the vocabulary clamps to the full vocab
    (coverage 1.0) rather than erroring, so a sweep over standard sizes
    works on any corpus.

    Scale shape: one explode+groupBy to the type-count table, then TWO
    range-partitioned prefix scans over that table (cumulative tokens +
    rank — ``scan.grouped_prev_cumsum`` on a constant key, no single-task
    window), a broadcast of the requested ks onto the rank, and one tiny
    global agg for (total, n_types). Work is |types|, never |tokens|,
    past the first groupBy.
    """
    from . import scan

    ks = sorted({int(k) for k in ks})
    if not ks or ks[0] < 1:
        raise ValueError(f"ks must be positive ints, got {ks}")
    toks = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"))
        .filter(F.col("__tok") != "")
    )
    cnt = toks.groupBy("__tok").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    tot_row = cnt.agg(
        F.sum("__c").alias("total"), F.count(F.lit(1)).alias("n_types")
    ).collect()[0]
    total, n_types = int(tot_row.total or 0), int(tot_row.n_types)
    if n_types == 0:
        raise ValueError("vocab_coverage: no tokens in corpus")
    order = [F.col("__c").desc(), F.col("__tok").asc()]
    g = cnt.withColumn("__g", F.lit(0))
    # r14 OPT (guide §2.4): cumulative mass and exclusive rank share one
    # ranged prefix-scan pass instead of two full cycles
    cum = scan.grouped_prev_cumsum_multi(
        g, "__g", order, [(F.col("__c"), "__cum_ex"), (F.lit(1), "__rk_ex")]
    )
    ranked = cum.select(
        (F.col("__rk_ex") + 1).cast("long").alias("rank"),
        (F.col("__cum_ex") + F.col("__c")).cast("long").alias("covered"),
    )
    spark = df.sparkSession
    want = spark.createDataFrame(
        [(k, min(k, n_types)) for k in ks], "k long, rank long"
    )
    return (
        ranked.join(F.broadcast(want), "rank")
        .select(
            "k",
            "rank",
            "covered",
            F.lit(total).cast("long").alias("total"),
            (F.col("covered").cast("double") / F.lit(float(total))).alias("coverage"),
        )
    )
