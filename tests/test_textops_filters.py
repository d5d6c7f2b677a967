"""Unit tests for the round-4 text-pipeline filters: BPE-ish token counting,
PII scrubbing and Gopher-style repetition stats.

token_count_bpe is checked against Python's `re` on the identical pattern —
a third engine (after Spark/Java and DuckDB/RE2) agreeing on the match count.
"""

import re

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators import textops


SAMPLES = [
    "Hello world, it's 42 degrees outside!",
    "the quick brown fox",
    "x",
    "   spaced   out   tokens   ",
    "I'll won't we're you've he's she'd they'd 100% a+b=c",
    "no-punct-just-dashes and_underscores mix3d t0kens",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_count_bpe_matches_python_re(spark):
    out = {
        r["doc_id"]: r["n"]
        for r in _df(spark, SAMPLES)
        .select("doc_id", textops.token_count_bpe(F.col("text")).alias("n"))
        .collect()
    }
    pat = re.compile(textops.BPE_SPLIT_RE)
    for i, s in enumerate(SAMPLES):
        assert out[i] == len(pat.findall(s)), f"sample {i}: {s!r}"


def test_token_count_bpe_contractions_split(spark):
    # "it's" = "it" + "'s": 2 BPE tokens, 1 whitespace token.
    row = (
        _df(spark, ["it's"])
        .select(
            textops.token_count_bpe(F.col("text")).alias("bpe"),
            textops.token_count(F.col("text")).alias("ws"),
        )
        .first()
    )
    assert row["bpe"] == 2 and row["ws"] == 1


def test_pii_scrub_redacts_and_counts(spark):
    txt = "mail a.b+c@ex-ample.co.uk or 10.20.30.40 or +1 555 010 9999 end"
    df = _df(spark, [txt])
    scrubbed = df.select(textops.pii_scrub(F.col("text")).alias("s")).first()["s"]
    assert "<EMAIL>" in scrubbed and "<IP>" in scrubbed and "<PHONE>" in scrubbed
    assert "@" not in scrubbed and "555" not in scrubbed
    stats = textops.pii_stats(df).first()
    assert (stats["n_email"], stats["n_ipv4"], stats["n_phone"]) == (1, 1, 1)


def test_pii_scrub_email_before_ip_ordering(spark):
    # Dotted numeric local-part would match the IPv4 pattern if the email
    # pass did not run first.
    txt = "reach 1.2.3.4@numbers.example please"
    scrubbed = (
        _df(spark, [txt]).select(textops.pii_scrub(F.col("text")).alias("s")).first()["s"]
    )
    assert scrubbed == "reach <EMAIL> please"


def test_pii_scrub_clean_text_unchanged(spark):
    txt = "perfectly ordinary sentence with numbers 12 34 and dots. done"
    df = _df(spark, [txt])
    assert df.select(textops.pii_scrub(F.col("text")).alias("s")).first()["s"] == txt
    stats = textops.pii_stats(df).first()
    assert (stats["n_email"], stats["n_ipv4"], stats["n_phone"]) == (0, 0, 0)


def test_repetition_stats_hand_computed(spark):
    # bigrams of "a b a b c": [a b, b a, a b, b c] -> top 2/4, dup 2/4
    df = _df(spark, ["a b a b c", "u v w x"])
    rows = {r["doc_id"]: r for r in textops.repetition_stats(df).collect()}
    assert rows[0]["n_ngrams"] == 4
    assert rows[0]["top_frac"] == pytest.approx(0.5)
    assert rows[0]["dup_frac"] == pytest.approx(0.5)
    # all-distinct bigrams: top = 1/3, dup = 0
    assert rows[1]["n_ngrams"] == 3
    assert rows[1]["top_frac"] == pytest.approx(round(1 / 3, 6))
    assert rows[1]["dup_frac"] == 0.0


def test_repetition_stats_short_docs_dropped(spark):
    # docs with < n tokens produce no n-grams and therefore no row —
    # matching the SQL oracle (GROUP BY over an empty gram set).
    df = _df(spark, ["single", "", "two tokens"])
    rows = {r["doc_id"]: r for r in textops.repetition_stats(df).collect()}
    assert set(rows) == {2}
    assert rows[2]["n_ngrams"] == 1


def test_simhash_candidates_matches_bruteforce_oracle(spark):
    """Banded candidate generation finds EXACTLY the pairs a brute-force
    Hamming scan over the bit-exact pure-Python signatures finds (pigeonhole
    guarantees no miss at hamming <= bands-1; the verify step kills every
    false candidate)."""
    import itertools
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    from xxh64 import simhash64_py

    from oaxaca_blinder_rs_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    sigs = {i: simhash64_py(t, k=2) for i, t in texts.items()}
    expected = {
        (a, b): bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_candidates(docs, max_hamming=3).collect()
    }
    assert got == expected and len(expected) > 0


def test_simhash_candidates_precomputed_signatures(spark):
    """sig_col path + pigeonhole edge cases: 3 flipped bits across 3 bands
    still collide on the untouched band; a 4-bit pair is dropped by the
    verify step; the sign-bit band works."""
    M = (1 << 64) - 1

    def i64(x):  # two's-complement int64 view of an unsigned 64-bit pattern
        x &= M
        return x - (1 << 64) if x >= (1 << 63) else x

    base = (1 << 63) + (0xABCD << 32) + 0x1234  # unsigned pattern, sign bit set
    rows = [
        (0, i64(base)),
        (1, i64(base ^ (1 << 2) ^ (1 << 20) ^ (1 << 40))),  # hamming 3, bands 0,1,2
        (2, i64(base ^ (1 << 2) ^ (1 << 20) ^ (1 << 40) ^ (1 << 63))),  # hamming 4 vs 0
        (3, i64(base ^ (1 << 63))),  # hamming 1 vs 0, differs only in sign band
    ]
    df = spark.createDataFrame(rows, "doc_id long, sig long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup_candidates_collect(df)
    }
    assert got[(0, 1)] == 3
    assert got[(0, 3)] == 1
    assert (0, 2) not in got
    assert got[(1, 2)] == 1


def dedup_candidates_collect(df):
    from oaxaca_blinder_rs_spark.operators import dedup

    return dedup.simhash_candidates(df, sig_col="sig", max_hamming=3).collect()


def test_simhash_table_matches_column_form(spark):
    """The vectorized explode+groupBy signature equals the 64-HOF Column
    form value-for-value (same shingles, hashes, vote rule)."""
    from oaxaca_blinder_rs_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 40
    )
    col_form = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", dedup.simhash64(F.col("text"), k=2).alias("sh")).collect()
    }
    table_form = {r["doc_id"]: r["simhash"] for r in dedup.simhash_table(docs).collect()}
    assert table_form == col_form and len(col_form) == 40


def test_ngram_logprob_hand_computed(spark):
    """docs 'a b a' / 'a b': C(a)=3 C(b)=2 V=2 C(a,b)=2 C(b,a)=1, alpha=0.1:
    P(b|a)=2.1/3.2, P(a|b)=1.1/2.2."""
    import math

    df = _df(spark, ["a b a", "a b"])
    rows = {r["doc_id"]: r for r in textops.ngram_logprob(df).collect()}
    p_ba = math.log(2.1 / 3.2)
    p_ab = math.log(1.1 / 2.2)
    assert rows[0]["n_bigrams"] == 2
    assert rows[0]["mean_logprob"] == pytest.approx(round((p_ba + p_ab) / 2, 6), abs=1e-6)
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["mean_logprob"] == pytest.approx(round(p_ba, 6), abs=1e-6)


def test_ngram_logprob_single_token_docs_dropped(spark):
    df = _df(spark, ["solo", "two words"])
    rows = {r["doc_id"]: r for r in textops.ngram_logprob(df).collect()}
    assert set(rows) == {1}


def test_bpe_and_pii_patterns_portable_on_random_strings(spark):
    """Fuzz the regex-dialect portability claim: on 400 seeded random
    strings over a hostile alphabet (quotes, digits, punctuation, spaces,
    pattern fragments), Spark's Java-regex counts equal Python re's counts
    for the BPE split and every PII pattern."""
    import random

    rng = random.Random(1234)
    alphabet = list(
        "abcXYZ019 .,!?'\"@+-_()[]{}#$%&*=/\\<>:;\n\tÀéß中"
    )
    fragments = ["it's", "a@b.co", "1.2.3.4", "+1 555 000 1234", "  ", "don't",
                 "x" * 30, "@@", "..", "'s", "10.0.0.1:8080", "e.g.", "we're"]
    strings = []
    for i in range(400):
        n = rng.randint(0, 60)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        if rng.random() < 0.5:
            cut = rng.randint(0, len(s))
            s = s[:cut] + rng.choice(fragments) + s[cut:]
        strings.append(s)

    df = _df(spark, strings)
    cols = [textops.token_count_bpe(F.col("text")).alias("bpe")]
    for label, pat, _ in textops.PII_PATTERNS:
        cols.append(F.regexp_count(F.col("text"), F.lit(pat)).alias(label))
    got = {r["doc_id"]: r for r in df.select("doc_id", *cols).collect()}

    bpe_re = re.compile(textops.BPE_SPLIT_RE)
    pii_res = [(label, re.compile(pat)) for label, pat, _ in textops.PII_PATTERNS]
    for i, s in enumerate(strings):
        assert got[i]["bpe"] == len(bpe_re.findall(s)), (i, s)
        for label, cre in pii_res:
            assert got[i][label] == len(cre.findall(s)), (label, i, s)


def test_script_id_and_ratios(spark):
    """Hand fixtures across scripts incl. mixed and empty."""
    texts = [
        "plain english text only",
        "пример текста на русском",
        "这是中文",
        "نص عربي",
        "ελληνικό κείμενο",
        "abcd абвг",  # exactly half latin / half cyrillic -> not > 0.5 -> mixed
        "1234 .,!? ",
    ]
    df = _df(spark, texts)
    sid = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", textops.script_id(F.col("text")).alias("s")).collect()
    }
    assert sid[0] == "latin"
    assert sid[1] == "cyrillic"
    assert sid[2] == "han"
    assert sid[3] == "arabic"
    assert sid[4] == "greek"
    assert sid[5] == "mixed"
    assert sid[6] == "und"
    rows = {r["doc_id"]: r for r in textops.script_ratios(df).collect()}
    assert rows[0]["r_latin"] == 1.0 and rows[0]["r_cyrillic"] == 0.0
    assert rows[6]["n_letters"] == 0 and rows[6]["r_latin"] == 0.0
    assert 0.0 < rows[5]["r_latin"] < 1.0 and 0.0 < rows[5]["r_cyrillic"] < 1.0


def test_script_id_tie_break_first_in_scripts_order(spark):
    """The r14 array_max argmax must keep the original fold's tie rule:
    among equal counts the FIRST script in SCRIPTS order wins the argmax
    (the > 0.5 gate then usually reports 'mixed'; with min_ratio lowered
    the winner itself becomes visible). Latin before Cyrillic, Cyrillic
    before Han, etc."""
    texts = [
        "ab аб",  # latin == cyrillic == 2 -> argmax ties -> latin first
        "аб 这是",  # cyrillic == han == 2 -> cyrillic first
    ]
    df = _df(spark, texts)
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", textops.script_id(F.col("text"), min_ratio=0.1).alias("s")
        ).collect()
    }
    assert got[0] == "latin"
    assert got[1] == "cyrillic"


def test_script_ratios_extra_columns_ride_the_same_projection(spark):
    """script_ratios(extra=[script_id(...)]) appends the guess column with
    identical values to the standalone computation and keeps the base
    schema prefix unchanged (the r14 q_script_ratios join removal)."""
    texts = ["plain english text only", "пример текста на русском", "1234 .,!? "]
    df = _df(spark, texts)
    fused = textops.script_ratios(
        df, extra=[textops.script_id(F.col("text")).alias("script_guess")]
    )
    base = textops.script_ratios(df)
    assert fused.columns == base.columns + ["script_guess"]
    joined = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", textops.script_id(F.col("text")).alias("s")).collect()
    }
    for r in fused.collect():
        assert r["script_guess"] == joined[r["doc_id"]]


def test_vocab_sketches_merge_to_exact_on_small_vocab(spark, sf_dir):
    """Mergeable HLL vocabulary sketches: per-shard sketches union to the
    whole-corpus estimate; on a small vocab HLL is exact; any shard subset
    estimates a subset vocabulary."""
    from oaxaca_blinder_rs_spark.operators import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(6)
    sk = textops.vocab_sketches(docs)
    assert sk.count() > 1  # several shard sketches
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    )
    exact = toks.distinct().count()
    assert textops.vocab_estimate(sk) == exact
    # sharding by a column works too and merges to the same estimate
    sk2 = textops.vocab_sketches(docs, shard_col=(F.col("doc_id") % 3))
    assert sk2.count() == 3
    assert textops.vocab_estimate(sk2) == exact
    assert textops.vocab_estimate(sk2.limit(1)) <= exact


def test_minhash_table_matches_column_form(spark):
    """The vectorized explode+groupBy MinHash equals the Column form
    signature-for-signature."""
    from oaxaca_blinder_rs_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 40
    )
    col_form = {
        r["doc_id"]: list(r["s"])
        for r in docs.select(
            "doc_id", dedup.minhash_signature(F.col("text"), num_perm=16, k=3).alias("s")
        ).collect()
    }
    table_form = {
        r["doc_id"]: list(r["sig"])
        for r in dedup.minhash_table(docs, num_perm=16, k=3).collect()
    }
    assert table_form == col_form and len(col_form) == 40


def test_table_forms_keep_short_docs(spark):
    """shingles() is never empty, so the exploded table forms are lossless:
    short / empty / null / whitespace-only docs keep a row and match the
    Column forms value-for-value (the advertised 'identical values' claim)."""
    from oaxaca_blinder_rs_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "hello world foo bar"), (2, "hi"), (3, ""), (4, None), (5, "   ")],
        ["doc_id", "text"],
    )
    col_mh = {
        r["doc_id"]: list(r["s"])
        for r in docs.select(
            "doc_id", dedup.minhash_signature(F.col("text"), num_perm=4, k=3).alias("s")
        ).collect()
    }
    tab_mh = {
        r["doc_id"]: list(r["sig"])
        for r in dedup.minhash_table(docs, num_perm=4, k=3).collect()
    }
    assert tab_mh == col_mh and len(tab_mh) == 5
    col_sh = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", dedup.simhash64(F.col("text")).alias("s")).collect()
    }
    tab_sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash_table(docs).collect()}
    assert tab_sh == col_sh and len(tab_sh) == 5


def test_adaptive_logprob_filter_per_group_threshold(spark):
    """Each group keeps its own top-frac by mean bigram logprob: a group of
    fluent docs and a group of gibberish must each keep ~half, where a
    global cutoff would drop all of one group."""
    from oaxaca_blinder_rs_spark.operators import textops

    fluent = [
        "the cat sat on the mat and the dog sat on the rug",
        "the cat sat on the rug and the dog sat on the mat",
        "a dog and a cat sat on a mat in the sun",
        "the sun was warm and the cat sat in the sun",
    ]
    gibberish = [
        "zxq vlk pft qrw mnb zxq plo",
        "vlk zxq qrw pft plo mnb kjh",
        "qrw pft zxq vlk mnb plo wer",
        "pft qrw vlk zxq plo kjh mnb",
    ]
    rows = [(i, "en", t) for i, t in enumerate(fluent)] + [
        (100 + i, "zz", t) for i, t in enumerate(gibberish)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    kept = textops.adaptive_logprob_filter(docs, frac=0.5, by_col="lang").collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # >= half of each group survives (ties keep extra), both groups present
    assert len(by_lang.get("en", [])) >= 2
    assert len(by_lang.get("zz", [])) >= 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        textops.adaptive_logprob_filter(docs, frac=0.0)


def test_bm25_hand_case_and_properties(spark):
    """BM25 (r6): hand-checkable ranking — a doc with more query-term hits
    and shorter length outranks a longer one; docs without query terms are
    absent; empty query raises."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.textops import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "hash join hash probe"),
            (2, "hash only once in a much longer document about other things"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["hash", "join"]).collect()}
    assert set(rows) == {1, 2}
    assert rows[1] > rows[2]
    # verify doc 1's score against the formula computed by hand
    N, k1, b = 3.0, 1.2, 0.75
    avgdl = (4 + 11 + 3) / 3.0
    def idf(df_): return math.log(1.0 + (N - df_ + 0.5) / (df_ + 0.5))
    def part(tf, dl, df_):
        return idf(df_) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    want1 = round(part(2, 4, 2) + part(1, 4, 1), 6)
    assert rows[1] == pytest.approx(want1, abs=1e-6)
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_normalize_text_hand_cases(spark):
    """normalize_text (r6): control chars stripped, whitespace collapsed,
    optional lowercase; tabs/newlines become single spaces."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.textops import normalize_text

    df = spark.createDataFrame(
        [("  Hello\tWorld\x00\x07  again\n\n ",), ("ok",)], "t string"
    )
    out = [r["n"] for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
    assert out == ["Hello World again", "ok"]
    low = df.select(normalize_text(F.col("t"), lowercase=True).alias("n")).collect()[0]["n"]
    assert low == "hello world again"
    raw = df.select(
        normalize_text(F.col("t"), collapse_whitespace=False, strip_control=False).alias("n")
    ).collect()[0]["n"]
    assert raw == "  Hello\tWorld\x00\x07  again\n\n "


def test_skew_report_hand_case(spark):
    from oaxaca_blinder_rs_spark.operators.skew import skew_report

    df = spark.createDataFrame([("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string")
    rows = {r["rank"]: (r["key"], r["n"], r["share"], r["cum_share"])
            for r in skew_report(df, "k", top_k=2).collect()}
    assert rows == {1: ("a", 6, 0.6, 0.6), 2: ("b", 3, 0.3, 0.9)}


def test_vocab_stats_hand_case(spark):
    """Hand-computed vocabulary report: counts, TTR, hapax fraction, and the
    deterministic (count desc, token asc) top pick; NULL/whitespace-only
    texts contribute nothing; tokens lowercase before counting."""
    from oaxaca_blinder_rs_spark.operators.textops import vocab_stats

    docs = spark.createDataFrame(
        [
            (1, "a A b c", "s1"),       # tokens: a a b c
            (2, "b B  b", "s1"),        # tokens: b b b
            (3, None, "s1"),            # nothing
            (4, "  ", "s1"),            # nothing
            (5, "x y", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in vocab_stats(docs).collect()}
    s1 = got["s1"]
    # s1: a:2 b:4 c:1 -> 7 tokens, 3 types, hapax {c}, top b (4/7)
    assert (s1["n_tokens"], s1["n_types"]) == (7, 3)
    assert s1["type_token_ratio"] == round(3 / 7, 6)
    assert s1["hapax_frac"] == round(1 / 3, 6)
    assert (s1["top_token"], s1["top_frac"]) == ("b", round(4 / 7, 6))
    s2 = got["s2"]
    # s2: x:1 y:1 — tie at count 1 -> lexicographically first token wins
    assert (s2["n_tokens"], s2["n_types"], s2["top_token"]) == (2, 2, "x")
    assert s2["hapax_frac"] == 1.0


def test_bpe_train_merges_sennrich_fixture(spark):
    """The classic BPE corpus (low/lower/newest/widest, Sennrich et al.
    2016): the first six learned rules with exact frequencies — including
    the freq ties at rank 1-3 (9,9,9) resolved by (left, right) ascending —
    and the end-of-word marker participating as a symbol."""
    from oaxaca_blinder_rs_spark.operators.textops import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower newest newest newest"),
         (2, "newest newest newest widest widest widest")],
        "doc_id long, text string",
    )
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in bpe_train_merges(docs, k_merges=6).orderBy("rank").collect()]
    assert got == [
        (1, "e", "s", 9), (2, "es", "t", 9), (3, "est", "</w>", 9),
        (4, "l", "o", 7), (5, "lo", "w", 7), (6, "e", "w", 6),
    ]
    # the apply-side artifact: the vocabulary segmented by the learned rules
    _, vocab = bpe_train_merges(docs, k_merges=6, return_vocab=True)
    seg = {r["w"]: list(r["tokens"]) for r in vocab.collect()}
    assert seg == {
        "low": ["low", "</w>"],
        "lower": ["low", "e", "r", "</w>"],
        "newest": ["n", "ew", "est</w>"],
        "widest": ["w", "i", "d", "est</w>"],
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_train_merges(docs, k_merges=0)


def test_bpe_train_merges_equal_symbol_runs(spark):
    """Greedy non-overlap on runs of equal symbols: 'aaaa' merges to
    (aa)(aa) — the (a,a) pair counts 3 overlapping occurrences but only
    every other position merges, and the next round learns (aa, aa)."""
    from oaxaca_blinder_rs_spark.operators.textops import bpe_train_merges

    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in bpe_train_merges(docs, k_merges=3).orderBy("rank").collect()]
    # word 'aaaa' (cnt 3): pairs (a,a) x3 -> merge 1 = (a,a) freq 9
    # after: [aa, aa, </w>] -> merge 2 candidates (aa,aa) freq 3, (aa,</w>) freq 3
    # tie -> left '</w>' < 'aa'? binary: '<' (0x3c) < 'a' (0x61) so (aa,</w>)
    # has left 'aa' and right '</w>'; compare (aa,aa) vs (aa,</w>): left equal,
    # right '</w>' < 'aa' -> (aa, </w>) wins rank 2.
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", "</w>", 3)
    # after: [aa, aa</w>] -> only pair (aa, aa</w>) freq 3
    assert got[2] == (3, "aa", "aa</w>", 3)


def test_bpe_train_merges_matches_pure_python_reference(spark):
    """Randomized corpora vs an independent pure-Python Sennrich
    implementation: merge rules (with the (freq desc, pair asc) tie rule)
    AND every word's final segmentation must agree — covers repeated-char
    runs, single-char words, and words that fully merge. Few examples
    because each run is a full distributed training (6 Spark jobs), but
    the generator is seeded for reproducibility."""
    import collections
    import random

    def ref_bpe(words, k):
        vocab = collections.Counter(words)
        seqs = {w: list(w) + ["</w>"] for w in vocab}
        rules = []
        for rank in range(1, k + 1):
            pc = collections.Counter()
            for w, c in vocab.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += c
            if not pc:
                break
            m = max(pc.values())
            l, r = sorted(p for p, c in pc.items() if c == m)[0]
            rules.append((rank, l, r, m))
            for w in seqs:
                acc = []
                for x in seqs[w]:
                    if acc and acc[-1] == l and x == r:
                        acc[-1] = l + r
                    else:
                        acc.append(x)
                seqs[w] = acc
        return rules, seqs

    from oaxaca_blinder_rs_spark.operators.textops import bpe_train_merges

    rng = random.Random(42)
    alphabet = "abz"  # tiny alphabet forces runs, ties and full merges
    for case in range(4):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 12))
        ]
        text = " ".join(words)
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        m_df, v_df = bpe_train_merges(docs, k_merges=3, return_vocab=True)
        got_rules = [(r["rank"], r["left"], r["right"], r["freq"])
                     for r in m_df.orderBy("rank").collect()]
        got_seqs = {r["w"]: list(r["tokens"]) for r in v_df.collect()}
        want_rules, want_seqs = ref_bpe(words, 3)
        assert got_rules == want_rules, (case, text, got_rules, want_rules)
        assert got_seqs == want_seqs, (case, text, got_seqs, want_seqs)


def test_bpe_select_merge_batch_safety_rules():
    """Driver-side unit test of the batched-greedy selection invariants
    (no Spark): the batch is a maximal prefix, stops on shared symbols
    (including merged tokens), stops at the strict creation ceiling, and
    always accepts the head candidate."""
    from oaxaca_blinder_rs_spark.operators.textops import _select_merge_batch

    # symbol-disjoint, fast-decaying freqs: all three batch together
    # (for ('a','b'): touching pairs are absent from the list, so c = floor
    # = 0 -> ceiling 0; every later freq > 0)
    cands = [("a", "b", 100), ("c", "d", 10), ("e", "f", 1)]
    assert _select_merge_batch(cands, 0, limit=10) == cands
    # limit truncates
    assert _select_merge_batch(cands, 0, limit=2) == cands[:2]
    # shared symbol stops the batch ('b' reused as a left)
    cands = [("a", "b", 100), ("b", "c", 90), ("e", "f", 1)]
    assert _select_merge_batch(cands, 0, limit=10) == [("a", "b", 100)]
    # merged-token collision stops the batch ('ab' appears as a left)
    cands = [("a", "b", 100), ("ab", "c", 90)]
    assert _select_merge_batch(cands, 0, limit=10) == [("a", "b", 100)]
    # creation ceiling: ('x','a') touches member symbol 'a' with freq 60,
    # so any pair the member's application touches may reach 2*60 = 120;
    # a 110-freq disjoint candidate may no longer be the true argmax
    cands = [("a", "b", 200), ("x", "a", 60), ("c", "d", 110)]
    assert _select_merge_batch(cands, 0, limit=10) == [("a", "b", 200)]
    # ...but a candidate strictly above the ceiling still batches
    cands = [("a", "b", 200), ("c", "d", 130), ("x", "a", 60)]
    assert _select_merge_batch(cands, 0, limit=10) == [("a", "b", 200), ("c", "d", 130)]
    # l == r adds the run-parity bound: ceil(100/2) + c
    cands = [("a", "a", 100), ("c", "d", 49)]
    assert _select_merge_batch(cands, 0, limit=10) == [("a", "a", 100)]
    cands = [("a", "a", 100), ("c", "d", 51)]
    assert _select_merge_batch(cands, 0, limit=10) == [("a", "a", 100), ("c", "d", 51)]
    # truncated list: f_floor raises the ceiling for unseen pairs
    cands = [("a", "b", 100), ("c", "d", 90)]
    assert _select_merge_batch(cands, 50, limit=10) == [("a", "b", 100)]


def test_bpe_train_merges_batched_matches_reference_k64(spark):
    """r9 scale axis (verdict item 5): batched merge rounds must stay
    BIT-IDENTICAL to one-at-a-time greedy at real-vocab merge counts.
    Randomized corpora, k=64, vs the same independent pure-Python Sennrich
    reference as the small-k fuzz — rules and every word's segmentation —
    plus a candidate_window=1 run (forced one-merge batches, the r8
    behavior) on the first corpus to pin window-size invariance."""
    import collections
    import random

    def ref_bpe(words, k):
        vocab = collections.Counter(words)
        seqs = {w: list(w) + ["</w>"] for w in vocab}
        rules = []
        for rank in range(1, k + 1):
            pc = collections.Counter()
            for w, c in vocab.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += c
            if not pc:
                break
            m = max(pc.values())
            l, r = sorted(p for p, c in pc.items() if c == m)[0]
            rules.append((rank, l, r, m))
            for w in seqs:
                acc = []
                for x in seqs[w]:
                    if acc and acc[-1] == l and x == r:
                        acc[-1] = l + r
                    else:
                        acc.append(x)
                seqs[w] = acc
        return rules, seqs

    from oaxaca_blinder_rs_spark.operators.textops import bpe_train_merges

    rng = random.Random(7)
    for case in range(2):
        # Zipf-ish repetition over a 6-letter alphabet: enough mass for 64
        # merges, with heavy ties and repeated-char runs
        base = [
            "".join(rng.choice("abcdez") for _ in range(rng.randint(1, 10)))
            for _ in range(30)
        ]
        words = [rng.choice(base) for _ in range(300)] + base
        text = " ".join(words)
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        m_df, v_df = bpe_train_merges(docs, k_merges=64, return_vocab=True)
        got_rules = [(r["rank"], r["left"], r["right"], r["freq"])
                     for r in m_df.orderBy("rank").collect()]
        got_seqs = {r["w"]: list(r["tokens"]) for r in v_df.collect()}
        want_rules, want_seqs = ref_bpe(words, 64)
        assert got_rules == want_rules, (case, got_rules[:8], want_rules[:8])
        assert got_seqs == want_seqs, case
        if case == 0:
            # window-size invariance: forced single-merge batches agree
            m1 = bpe_train_merges(docs, k_merges=16, candidate_window=1)
            got1 = [(r["rank"], r["left"], r["right"], r["freq"])
                    for r in m1.orderBy("rank").collect()]
            assert got1 == want_rules[:16]


def test_bpe_encode_matches_pure_python_apply(spark):
    """r9 encode face: documents encoded with the trained vocabulary must be
    the in-order concatenation of the pure-Python reference segmentations —
    on the TRAINING corpus (skip path, zero OOV by construction) AND on
    held-out text (apply path: char-split + merge rules in rank order). The
    pure-Python apply is one greedy left-to-right pass per rule — the same
    reference as the training fuzz tests."""
    import collections
    import random

    def ref_bpe(words, k):
        vocab = collections.Counter(words)
        seqs = {w: list(w) + ["</w>"] for w in vocab}
        rules = []
        for rank in range(1, k + 1):
            pc = collections.Counter()
            for w, c in vocab.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += c
            if not pc:
                break
            m = max(pc.values())
            l, r = sorted(p for p, c in pc.items() if c == m)[0]
            rules.append((rank, l, r, m))
            for w in seqs:
                seqs[w] = ref_apply_one(seqs[w], l, r)
        return rules, seqs

    def ref_apply_one(s, l, r):
        acc = []
        for x in s:
            if acc and acc[-1] == l and x == r:
                acc[-1] = l + r
            else:
                acc.append(x)
        return acc

    def ref_apply(word, rules):
        s = list(word) + ["</w>"]
        for _rank, l, r, _f in rules:
            s = ref_apply_one(s, l, r)
        return s

    from oaxaca_blinder_rs_spark.operators.textops import bpe_encode, bpe_train_merges

    rng = random.Random(99)
    alphabet = "abcz"
    train_words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(train_words[i * 8:(i + 1) * 8])) for i in range(5)],
        "doc_id long, text string",
    )
    m_df, v_df = bpe_train_merges(docs, k_merges=8, return_vocab=True)
    rules, seqs = ref_bpe(train_words, 8)

    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode(docs, v_df, oov="skip").collect()
    }
    for i in range(5):
        want = [t for w in train_words[i * 8:(i + 1) * 8] for t in seqs[w]]
        assert got[i] == (want, len(want)), i

    # held-out corpus: unseen words exercise the merge-replay OOV path,
    # seen words the vocabulary join — mixed in one document
    held = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(12)] + train_words[:4]
    rng.shuffle(held)
    new_docs = spark.createDataFrame(
        [(0, " ".join(held))], "doc_id long, text string"
    )
    out = bpe_encode(new_docs, v_df, merges=m_df, oov="apply").collect()[0]
    want = [t for w in held for t in (seqs[w] if w in seqs else ref_apply(w, rules))]
    assert list(out["tokens"]) == want
    assert out["n_tokens"] == len(want)

    # chars fallback: OOV words stay char+'</w>'
    out_c = bpe_encode(new_docs, v_df, oov="chars").collect()[0]
    want_c = [
        t for w in held
        for t in (seqs[w] if w in seqs else list(w) + ["</w>"])
    ]
    assert list(out_c["tokens"]) == want_c

    import pytest

    with pytest.raises(ValueError, match="merges"):
        bpe_encode(new_docs, v_df, oov="apply").collect()
    with pytest.raises(ValueError, match="oov"):
        bpe_encode(new_docs, v_df, oov="bogus")


def test_bpe_token_ids_deterministic_and_complete(spark):
    """Token ids cover exactly the distinct segment tokens, are contiguous
    from 0, and order by (corpus freq DESC, token ASC) — the deterministic
    assignment the oracle replays."""
    import collections

    from oaxaca_blinder_rs_spark.operators.textops import bpe_token_ids, bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aa ab aa ba ab aa"), (2, "ab ba aa aa b a")],
        "doc_id long, text string",
    )
    _, v_df = bpe_train_merges(docs, k_merges=3, return_vocab=True)
    vocab = {r["w"]: (r["cnt"], list(r["tokens"])) for r in v_df.collect()}
    freq = collections.Counter()
    for _w, (cnt, toks) in vocab.items():
        for t in toks:
            freq[t] += cnt
    want = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r["token"], r["freq"], r["token_id"])
        for r in bpe_token_ids(v_df).orderBy("token_id").collect()
    ]
    assert [(t, f) for t, f, _ in got] == want
    assert [i for _, _, i in got] == list(range(len(want)))


def test_kneser_ney_logprob_matches_pure_python(spark):
    """Interpolated KN bigram LM (r9) vs an independent pure-Python
    replica: bigram/context/continuation counts, the discount formula,
    per-doc mean — and the single-token doc is absent (no bigrams), the
    ngram_logprob convention. Fluent repeated-pattern text must outscore a
    shuffled-gibberish twin (the filter's purpose). Validation on a bad
    discount."""
    import collections
    import math

    import pytest

    from oaxaca_blinder_rs_spark.operators.textops import kneser_ney_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog"),
        (4, "single"),
        (5, "the the the"),
        (6, "mat rug the on cat sat"),  # same words as 1, scrambled
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    D = 0.75

    bigs = {}
    for i, t in rows:
        ws = t.lower().strip().split()
        bigs[i] = list(zip(ws, ws[1:]))
    bc = collections.Counter(b for bs in bigs.values() for b in bs)
    ctx_tot: collections.Counter = collections.Counter()
    n_fwd: collections.Counter = collections.Counter()
    n_back: collections.Counter = collections.Counter()
    for (w1, w2), c in bc.items():
        ctx_tot[w1] += c
        n_fwd[w1] += 1
        n_back[w2] += 1
    n_types = len(bc)

    def p(w1, w2):
        return (
            max(bc[(w1, w2)] - D, 0) + D * n_fwd[w1] * n_back[w2] / n_types
        ) / ctx_tot[w1]

    want = {
        i: (len(bs), round(sum(math.log(p(*b)) for b in bs) / len(bs), 6))
        for i, bs in bigs.items()
        if bs
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in kneser_ney_logprob(df).collect()
    }
    assert got == want
    assert 4 not in got  # single token -> no bigrams -> absent
    # the common-transition docs outscore the scrambled twin
    assert got[1][1] > got[6][1] and got[2][1] > got[6][1]

    with pytest.raises(ValueError, match="discount"):
        kneser_ney_logprob(df, discount=1.0)


# ---- C4 blocklist gate (round 10) -------------------------------------------


def _bl_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the DUP appears here dup twice"),
            (2, "clean text with no banned words"),
            (3, "dup"),
            (4, None),
            (5, "  duplicate is NOT a hit (whole-token matching)  "),
            (6, "unsafe unsafe dup"),
        ],
        "doc_id long, text string",
    )


def test_blocklist_stats_literal_path(spark):
    got = {
        r.doc_id: (r.n_hits, r.n_terms, r.kept)
        for r in textops.blocklist_stats(_bl_docs(spark), ["dup", "unsafe"]).collect()
    }
    assert got == {
        1: (2, 1, False),   # case-folded, counted per occurrence
        2: (0, 0, True),
        3: (1, 1, False),
        4: (0, 0, True),    # null text is clean
        5: (0, 0, True),    # substring "dup" in "duplicate" must NOT match
        6: (3, 2, False),
    }


def test_blocklist_stats_join_path_equals_literal(spark):
    docs = _bl_docs(spark)
    lit = sorted(tuple(r) for r in textops.blocklist_stats(docs, ["dup", "unsafe"]).collect())
    join = sorted(
        tuple(r)
        for r in textops.blocklist_stats(docs, ["dup", "unsafe"], max_literal_terms=0).collect()
    )
    assert lit == join


def test_blocklist_filter_and_validation(spark):
    docs = _bl_docs(spark)
    kept = sorted(r.doc_id for r in textops.blocklist_filter(docs, ["dup", "unsafe"]).collect())
    assert kept == [2, 4, 5]
    # max_hits loosens the gate (doc 3 has exactly one hit)
    kept1 = sorted(
        r.doc_id for r in textops.blocklist_filter(docs, ["dup", "unsafe"], max_hits=1).collect()
    )
    assert kept1 == [2, 3, 4, 5]
    with pytest.raises(ValueError, match="distinct"):
        textops.blocklist_stats(docs, ["Dup", "dup"])
    with pytest.raises(ValueError, match="single tokens"):
        textops.blocklist_stats(docs, ["two words"])
    # r12 (ADVICE): ANY embedded whitespace is rejected, not just a literal
    # space — a tab/newline term would silently never match a \s+-split token
    for bad in ["two\twords", "two\nwords", "nbsp joined"]:
        with pytest.raises(ValueError, match="single tokens"):
            textops.blocklist_stats(docs, [bad])
        with pytest.raises(ValueError, match="single tokens"):
            textops.blocklist_filter(docs, [bad])


def test_tokenizer_fertility(spark):
    """Fertility math on a constructed frame: known word/BPE-token counts."""
    df = spark.createDataFrame(
        [("en", "hello world"), ("en", "it's nice"), ("de", "ein test"), ("xx", None)],
        "lang string, text string",
    )
    rows = {r.lang: r for r in textops.tokenizer_fertility(df).collect()}
    # "hello world" -> 2 words, 2 bpe; "it's nice" -> 2 words, 3 bpe (it|'s| nice)
    en = rows["en"]
    assert en.n_docs == 2 and en.n_words == 4 and en.n_bpe_tokens == 5
    assert en.fertility == round(5 / 4, 6)
    assert en.chars_per_token == round((11 + 9) / 5, 6)
    de = rows["de"]
    assert de.n_words == 2 and de.n_bpe_tokens == 2 and de.fertility == 1.0
    # null text: token_count('') counts the [''] artifact word, 0 bpe tokens
    xx = rows["xx"]
    assert xx.n_docs == 1 and xx.n_bpe_tokens == 0 and xx.chars_per_token is None


def test_blocklist_paths_fuzzed_equal(spark):
    """Fuzz (fixed seeds): literal-codegen and broadcast-join blocklist
    regimes agree on random unicode corpora and random term lists."""
    import random

    rng = random.Random(20260816)
    alphabet = ["alpha", "beta", "Gamma", "δέλτα", "x1", "-", "a'b", "c.d", "Ω"]
    for trial in range(4):
        docs = []
        for i in range(rng.randint(5, 40)):
            words = rng.choices(alphabet, k=rng.randint(0, 12))
            docs.append((i, " ".join(words) if words else rng.choice(["", None])))
        terms = rng.sample([t.lower() for t in alphabet], rng.randint(1, 4))
        df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
        lit = sorted(tuple(r) for r in textops.blocklist_stats(df, terms).collect())
        join = sorted(
            tuple(r)
            for r in textops.blocklist_stats(df, terms, max_literal_terms=0).collect()
        )
        assert lit == join, (trial, terms)


def test_blocklist_filter_validation_and_threshold_knob(spark):
    """r11 (ADVICE): blocklist_filter validates terms exactly like
    blocklist_stats in BOTH regimes — a multi-word term can never match a
    whitespace token, so it must raise, not become a silent no-op safety
    gate — and the max_literal_terms regime knob plumbs through: forcing
    the broadcast-join regime (threshold 0) keeps the same rows."""
    docs = _bl_docs(spark)
    with pytest.raises(ValueError, match="single tokens"):
        textops.blocklist_filter(docs, ["two words"])
    with pytest.raises(ValueError, match="single tokens"):
        textops.blocklist_filter(docs, [" padded "])
    with pytest.raises(ValueError, match="single tokens"):
        textops.blocklist_filter(docs, [""])
    lit = sorted(r.doc_id for r in textops.blocklist_filter(docs, ["dup", "unsafe"]).collect())
    join = sorted(
        r.doc_id
        for r in textops.blocklist_filter(
            docs, ["dup", "unsafe"], max_literal_terms=0
        ).collect()
    )
    assert lit == join == [2, 4, 5]


def test_boilerplate_line_removal(spark):
    """remove_boilerplate_lines (r11): a line repeated in >= min_docs
    distinct docs of one source is removed everywhere IN that source (not
    in others); blank lines are never flagged; single-doc repetition does
    not count (distinct-doc rule); order and surviving blanks preserved;
    an all-boilerplate doc becomes ''; schema passes through."""
    from oaxaca_blinder_rs_spark.operators.textops import (
        boilerplate_line_stats,
        remove_boilerplate_lines,
    )

    rows = [
        (1, "a.com", "COOKIE BANNER\nreal content one\n\nfooter"),
        (2, "a.com", "COOKIE BANNER\nreal content two\nfooter"),
        (3, "a.com", "COOKIE BANNER\nunique text"),
        (4, "a.com", "COOKIE BANNER\nfooter"),
        # same line on ANOTHER source: only 1 doc there -> stays
        (5, "b.com", "COOKIE BANNER\nb content"),
        # repeated WITHIN one doc only -> distinct-doc count is 1 -> stays
        (6, "b.com", "echo\necho\necho"),
        (7, "b.com", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    stats = {
        (r.source, r.line): r.n_docs
        for r in boilerplate_line_stats(df, min_docs=4).collect()
    }
    assert stats == {("a.com", "COOKIE BANNER"): 4}
    out = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(df, min_docs=4).collect()
    }
    assert out[1] == "real content one\n\nfooter"  # blank line survives
    assert out[2] == "real content two\nfooter"
    assert out[3] == "unique text"
    assert out[4] == "footer"
    assert out[5] == "COOKIE BANNER\nb content"  # other source untouched
    assert out[6] == "echo\necho\necho"
    assert out[7] == ""  # null text -> empty, not null
    cleaned = remove_boilerplate_lines(df, min_docs=3)
    assert cleaned.columns == df.columns
    # min_docs=3 also takes a.com's footer (docs 1, 2, 4)
    out2 = {r.doc_id: r.text for r in cleaned.collect()}
    assert out2[1] == "real content one\n"
    assert out2[4] == ""  # every line flagged -> empty string
    with __import__("pytest").raises(ValueError, match="min_docs"):
        boilerplate_line_stats(df, min_docs=1)
    # global mode (by_col=None): COOKIE BANNER now spans 5 docs -> removed
    # from b.com too
    g = {r.doc_id: r.text for r in remove_boilerplate_lines(df, by_col=None, min_docs=5).collect()}
    assert g[5] == "b content"


# ---- intra-document line dedup (round 12) -------------------------------------


def test_dedup_lines_in_doc(spark):
    """Keep-first-occurrence per document, order and blank lines preserved,
    NULL as empty; idempotent; untouched docs unchanged byte-for-byte."""
    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb"),
            (2, None),
            (3, ""),
            (4, "x"),
            (5, "a\n\nb\n\na"),  # blank lines dedup like any other value
            (6, "menu\nbody one\nmenu\nbody two\nmenu"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in textops.dedup_lines_in_doc(df).collect()}
    assert got == {
        1: "a\nb\nc",
        2: "",
        3: "",
        4: "x",
        5: "a\n\nb",
        6: "menu\nbody one\nbody two",
    }
    twice = {
        r.doc_id: r.text
        for r in textops.dedup_lines_in_doc(textops.dedup_lines_in_doc(df)).collect()
    }
    assert twice == got


# ---- PMI collocations (round 12) ----------------------------------------------


def test_pmi_bigrams_hand_computed(spark):
    """Corpus 'a b a b c' x2 + 'a b': pair (a,b) count 5, unigram a=5 b=5
    c=2 N_uni=12... computed literally against the formula; min_count
    gates the rare pairs; ordering is (pmi desc, w1, w2)."""
    import math

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b a b c"), (3, "a b")],
        "doc_id long, text string",
    )
    # bigrams: doc1/doc2 each [ab, ba, ab, bc], doc3 [ab] -> N_big = 9
    # counts: ab=5, ba=2, bc=2; unigrams: a=5, b=5, c=2, N_uni=12
    out = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in
           textops.pmi_bigrams(df, min_count=2, top_n=10).collect()}
    def pmi(c12, c1, c2):
        return math.log((c12 / 9.0) / ((c1 / 12.0) * (c2 / 12.0)))
    assert out[("a", "b")][0] == 5 and abs(out[("a", "b")][1] - pmi(5, 5, 5)) < 1e-12
    assert out[("b", "a")][0] == 2 and abs(out[("b", "a")][1] - pmi(2, 5, 5)) < 1e-12
    assert out[("b", "c")][0] == 2 and abs(out[("b", "c")][1] - pmi(2, 5, 2)) < 1e-12
    # min_count=3 keeps only (a, b)
    only = textops.pmi_bigrams(df, min_count=3, top_n=10).collect()
    assert [(r.w1, r.w2) for r in only] == [("a", "b")]
    # top_n=1: (a,b) and (b,c) tie at exactly ln(3.2) — the deterministic
    # (pmi desc, w1 asc, w2 asc) tie-break keeps (a,b)
    assert abs(out[("a", "b")][1] - out[("b", "c")][1]) < 1e-12
    head = textops.pmi_bigrams(df, min_count=2, top_n=1).collect()
    assert [(r.w1, r.w2) for r in head] == [("a", "b")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_count"):
        textops.pmi_bigrams(df, min_count=0)
    with _pytest.raises(ValueError, match="top_n"):
        textops.pmi_bigrams(df, top_n=0)


def test_vocab_coverage_laws(spark):
    """r13: vocab_coverage — hand-counted fixture (exact tallies, tie-break
    on token asc), clamping past the vocabulary, monotonicity, validation."""
    import pytest as _pytest

    from oaxaca_blinder_rs_spark.operators.textops import vocab_coverage

    # counts: a=4, b=3, c=3, d=1  (total 11; tie b/c broken by token asc)
    df = spark.createDataFrame(
        [(0, "a a b c"), (1, "a b c d"), (2, "a b c")], "doc_id long, text string"
    )
    got = {r["k"]: r for r in vocab_coverage(df, [1, 2, 3, 100]).collect()}
    assert got[1]["covered"] == 4 and got[1]["total"] == 11
    assert got[2]["covered"] == 7          # a + b (tie-break b before c)
    assert got[3]["covered"] == 10
    assert got[100]["rank"] == 4 and got[100]["covered"] == 11
    assert got[100]["coverage"] == 1.0
    covs = [got[k]["coverage"] for k in (1, 2, 3, 100)]
    assert covs == sorted(covs)            # monotone non-decreasing
    assert got[1]["coverage"] == 4.0 / 11.0

    with _pytest.raises(ValueError, match="positive"):
        vocab_coverage(df, [0, 5])
    with _pytest.raises(ValueError, match="no tokens"):
        vocab_coverage(
            spark.createDataFrame([(0, "")], "doc_id long, text string"), [1]
        )
