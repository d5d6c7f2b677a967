"""HyperLogLog sketch tests (operators/sketches.py, round 6)."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators import sketches


def test_hll_estimate_accuracy_and_determinism(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("u")
    )
    exact = ev.distinct().count()
    row = sketches.hll_count_distinct(ev, "u", p=8).collect()[0]
    m = row["m"]
    assert m == 256
    # standard error ~1.04/sqrt(m) ~ 6.5%; allow 4 sigma
    assert abs(row["estimate"] - exact) <= max(4 * 1.04 / (m ** 0.5) * exact, 10.0)
    again = sketches.hll_count_distinct(ev, "u", p=8).collect()[0]
    assert again["estimate"] == row["estimate"]


def test_hll_registers_merge_is_max(spark, sf_dir):
    """Sketch union = register-wise max: merging the two halves' register
    tables reproduces the whole corpus's registers exactly."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("u"), "event_id"
    )
    whole = sketches.hll_registers(ev, "u", p=6)
    a = sketches.hll_registers(ev.filter(F.col("event_id") % 2 == 0), "u", p=6)
    b = sketches.hll_registers(ev.filter(F.col("event_id") % 2 == 1), "u", p=6)
    merged = (
        a.unionByName(b).groupBy("register").agg(F.max("rho").alias("rho"))
    )
    got = {r["register"]: r["rho"] for r in merged.collect()}
    want = {r["register"]: r["rho"] for r in whole.collect()}
    assert got == want


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinality -> linear-counting branch: estimate lands within a
    couple of counts of the exact value."""
    df = spark.createDataFrame([(f"v{i}",) for i in range(20)], "u string")
    row = sketches.hll_count_distinct(df, "u", p=8).collect()[0]
    assert row["zeros"] >= 236
    assert abs(row["estimate"] - 20) <= 2.0


def test_hll_plan_partial_aggregation(spark, sf_dir):
    """Scale contract: ONE shuffle keyed by the (<= 2^p)-ary register index
    with a map-side partial max; no window, no collect."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("u")
    )
    plan = (
        sketches.hll_registers(ev, "u", p=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max" in plan or "partial_" in plan
    assert "Window" not in plan


def test_hll_p_validation(spark):
    df = spark.createDataFrame([("a",)], "u string")
    with pytest.raises(ValueError):
        sketches.hll_registers(df, "u", p=2)


def test_cms_overcount_bound_and_merge(spark, sf_dir):
    """CMS never undercounts; with w=256/d=4 over ~10k events the
    overcount stays within the eN/w-style bound; merging the two halves'
    tables by cell-wise sum reproduces the whole sketch."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("u"), "event_id"
    )
    n = ev.count()
    cms = sketches.cms_table(ev, "u", w=256, d=4)
    truth = {r["u"]: r["n"] for r in ev.groupBy("u").agg(F.count("*").alias("n")).collect()}
    probes = ev.select("u").distinct().limit(50)
    est = {r["value"]: r["estimate"] for r in sketches.cms_estimate(cms, probes, "u", w=256, d=4).collect()}
    assert len(est) > 0
    for v, e in est.items():
        assert e >= truth[v], (v, e, truth[v])
        assert e - truth[v] <= 4 * n / 256, (v, e, truth[v])
    # merge = cell-wise sum
    a = sketches.cms_table(ev.filter(F.col("event_id") % 2 == 0), "u", w=256, d=4)
    b = sketches.cms_table(ev.filter(F.col("event_id") % 2 == 1), "u", w=256, d=4)
    merged = a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    got = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    want = {(r["row"], r["col"]): r["cnt"] for r in cms.collect()}
    assert got == want


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "u string")
    with pytest.raises(ValueError):
        sketches.cms_table(df, "u", w=100)
    with pytest.raises(ValueError):
        sketches.cms_table(df, "u", w=256, d=0)


def test_bloom_no_false_negatives_and_fp_rate(spark, sf_dir):
    """Every built key must test present (no false negatives); absent keys
    show only the expected small false-positive rate; union of two builds
    by per-word bit_or equals the whole build."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("u"), "user_id", "event_id"
    )
    present = ev.filter(F.col("user_id") % 2 == 0).select("u").distinct()
    bloom = sketches.bloom_build(present, "u", m_bits=2048, k=3)
    probes = ev.select("u", "user_id").distinct()
    got = {r["value"]: r["maybe_present"]
           for r in sketches.bloom_maybe_contains(bloom, probes.select("u"), "u", m_bits=2048, k=3).collect()}
    evens = {r["u"] for r in present.collect()}
    absent = [v for v in got if v not in evens]
    assert all(got[v] for v in evens)          # no false negatives
    fp = sum(1 for v in absent if got[v])
    assert fp <= max(3, 0.2 * len(absent))     # load ~0.1 -> fp well under 20%
    # merge = per-word bit_or
    a = sketches.bloom_build(present.filter(F.col("u").cast("long") < 60), "u", m_bits=2048, k=3)
    b = sketches.bloom_build(present.filter(F.col("u").cast("long") >= 60), "u", m_bits=2048, k=3)
    merged = a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    assert {(r["word"], r["bits"]) for r in merged.collect()} == \
           {(r["word"], r["bits"]) for r in bloom.collect()}


def test_bloom_validation(spark):
    df = spark.createDataFrame([("a",)], "u string")
    with pytest.raises(ValueError):
        sketches.bloom_build(df, "u", m_bits=100)
    with pytest.raises(ValueError):
        sketches.bloom_build(df, "u", m_bits=512, k=0)


def test_hll_by_key_matches_per_group_global(spark, sf_dir):
    """Per-group HLL estimates equal running the GLOBAL estimator on each
    group's rows separately — the grouped form is a pure re-keying, and
    accuracy holds per group."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    got = {r["key"]: (r["zeros"], r["estimate"])
           for r in sketches.hll_count_distinct_by(ev, "event_type", "u", p=8).collect()}
    for et in [r["event_type"] for r in ev.select("event_type").distinct().collect()]:
        sub = ev.filter(F.col("event_type") == et)
        glob = sketches.hll_count_distinct(sub, "u", p=8).collect()[0]
        assert got[et] == (glob["zeros"], glob["estimate"]), et
        exact = sub.select("u").distinct().count()
        assert abs(got[et][1] - exact) <= max(4 * 1.04 / 16 * exact, 10.0)


def test_hll_union_and_intersection_estimates(spark, sf_dir):
    """Sketch algebra: union estimate from merged registers tracks the
    exact union; inclusion-exclusion intersection tracks the exact
    overlap (within HLL error at p=8, ~6.5% of the UNION size)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("u"), "user_id"
    )
    a = ev.filter(F.col("user_id") % 3 != 0).select("u")
    b = ev.filter(F.col("user_id") % 2 != 0).select("u")
    exact_a = a.distinct().count()
    exact_b = b.distinct().count()
    exact_u = a.union(b).distinct().count()
    exact_i = exact_a + exact_b - exact_u
    ra, rb = sketches.hll_registers(a, "u", 8), sketches.hll_registers(b, "u", 8)
    eu = sketches.hll_union_estimate(ra, rb, 8).collect()[0]["union_estimate"]
    assert abs(eu - exact_u) <= max(4 * 1.04 / 16 * exact_u, 10.0)
    ei = sketches.hll_intersection_estimate(a, b, "u", 8).collect()[0]["intersection_estimate"]
    assert abs(ei - exact_i) <= max(12 * 1.04 / 16 * exact_u, 15.0)


# ---- Misra-Gries heavy hitters (round 10) ----------------------------------


def test_heavy_hitters_exact_vs_groupby(spark, sf_dir):
    """The sketch path must equal the brute-force groupBy top-k exactly,
    including the (count desc, key asc) tie-break."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    got = [(r.key, r.n_exact) for r in sketches.heavy_hitters(toks, "t", k=10, capacity=512).collect()]
    want = [
        (r.t, r.n)
        for r in toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("t"))
        .limit(10)
        .collect()
    ]
    assert sorted(got) == sorted(want)


def test_heavy_hitters_guard_raises_at_tiny_capacity(spark, sf_dir):
    """With capacity far below the distinct-key count the eviction bound
    swallows the rank-k count and the provability guard must raise rather
    than return a possibly-wrong top-k."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException, Exception),
        match="not provably exact|no candidate survived",
    ):
        sketches.heavy_hitters(toks, "t", k=10, capacity=2).collect()


def test_mg_summaries_bounded_and_superset(spark):
    """Pass-1 output stays bounded at partitions x (capacity+1) rows and the
    surviving keys form a superset of every key heavier than the summed
    eviction bound (the averaging argument heavy_hitters rests on)."""
    rows = [("hot",)] * 400 + [(f"cold{i}",) for i in range(300)] * 2
    df = spark.createDataFrame(rows, "key string").repartition(4)
    p1 = sketches.mg_summaries(df, "key", capacity=16).collect()
    n_parts = df.rdd.getNumPartitions()
    assert len(p1) <= n_parts * 17
    u = sum(r.mg_est for r in p1 if r.key is None)
    survivors = {r.key for r in p1 if r.key is not None}
    exact = {r.key: r.n for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, n in exact.items():
        if n > u:
            assert k in survivors, (k, n, u)


def test_heavy_hitters_null_and_cast_handling(spark):
    """Nulls never count; non-string keys cast to their string form."""
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,), (None,), (3,)], "k int"
    )
    got = [(r.key, r.n_exact) for r in sketches.heavy_hitters(df, "k", k=3, capacity=64).collect()]
    assert got == [("1", 2), ("2", 1), ("3", 1)]


def test_heavy_hitters_weighted_matches_groupby_sum(spark, sf_dir):
    """weight_col switches the measure to exact weighted sums (top sources
    by character volume) — equal to the direct groupBy/sum top-k."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.key, r.n_exact)
        for r in sketches.heavy_hitters(
            docs, "source", k=5, capacity=64, weight_col="n_chars"
        ).collect()
    ]
    want = [
        (r.source, r.s)
        for r in docs.groupBy("source")
        .agg(F.sum("n_chars").alias("s"))
        .orderBy(F.col("s").desc(), F.col("source"))
        .limit(5)
        .collect()
    ]
    assert sorted(got) == sorted(want)


def test_heavy_hitters_weighted_eviction_superset(spark):
    """Weighted MG under eviction pressure: the heavy key (one giant weight)
    must survive; weighted U bounds every non-candidate's true weight."""
    rows = [("whale", 10_000)] + [(f"m{i}", 7) for i in range(200)] * 3
    df = spark.createDataFrame(rows, "key string, w long").repartition(4)
    p1 = sketches.mg_summaries(df, "key", capacity=8, weight_col="w").collect()
    u = sum(r.mg_est for r in p1 if r.key is None)
    survivors = {r.key for r in p1 if r.key is not None}
    assert "whale" in survivors
    exact = {
        r.key: r.s for r in df.groupBy("key").agg(F.sum("w").alias("s")).collect()
    }
    for k, s in exact.items():
        if s > u:
            assert k in survivors, (k, s, u)


def test_heavy_hitters_weight_validation(spark):
    df = spark.createDataFrame([("a", 1.5)], "key string, w double")
    with pytest.raises(ValueError, match="integer column"):
        sketches.heavy_hitters(df, "key", weight_col="w")
    neg = spark.createDataFrame([("a", -1)], "key string, w long")
    with pytest.raises(Exception, match="negative weight"):
        sketches.heavy_hitters(neg, "key", weight_col="w").collect()
    # null weights count as zero
    nw = spark.createDataFrame([("a", 5), ("a", None), ("b", 3)], "key string, w long")
    got = [(r.key, r.n_exact) for r in sketches.heavy_hitters(nw, "key", k=2, weight_col="w").collect()]
    assert got == [("a", 5), ("b", 3)]


def test_heavy_hitters_shuffle_fallback_matches_broadcast(spark, sf_dir):
    """The broadcast-size guard (r11): forcing the shuffle-join fallback with
    a tiny max_broadcast_candidates must produce bit-identical output, and
    the executed plan must show the candidate join is NOT broadcast."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    bc = sketches.heavy_hitters(toks, "t", k=10, capacity=512)
    sh = sketches.heavy_hitters(toks, "t", k=10, capacity=512, max_broadcast_candidates=1)
    assert sorted((r.key, r.n_exact) for r in bc.collect()) == sorted(
        (r.key, r.n_exact) for r in sh.collect()
    )


def test_heavy_hitters_verify_external_candidates(spark):
    """heavy_hitters_verify (r11): the pass-2 face over an EXTERNAL candidate
    set — a SUPERSET of candidates and an int u_bound give the same top-k as
    the fused operator, and a u_bound that swallows rank-k raises."""
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 10 + [("d",)] * 2
    df = spark.createDataFrame(rows, "key string")
    cands = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz_extra",)], "key string")
    got = [
        (r.key, r.n_exact)
        for r in sketches.heavy_hitters_verify(df, "key", cands, 0, k=3).collect()
    ]
    assert got == [("a", 50), ("b", 30), ("c", 10)]
    # a u_bound >= the rank-k count makes rank k unprovable -> raise
    with pytest.raises(Exception, match="not provably exact"):
        sketches.heavy_hitters_verify(df, "key", cands, 10, k=3).collect()


def test_heavy_hitters_verify_weight_validation(spark):
    """r11: the external pass-2 face enforces the same weight rules as the
    fused path — float weight columns raise at plan time, negative weights
    raise at execution, null weights count as zero."""
    cands = spark.createDataFrame([("a",), ("b",)], "key string")
    fw = spark.createDataFrame([("a", 1.5)], "key string, w double")
    with pytest.raises(ValueError, match="integer column"):
        sketches.heavy_hitters_verify(fw, "key", cands, 0, k=1, weight_col="w")
    neg = spark.createDataFrame([("a", -1)], "key string, w long")
    with pytest.raises(Exception, match="negative weight"):
        sketches.heavy_hitters_verify(neg, "key", cands, 0, k=1, weight_col="w").collect()
    nw = spark.createDataFrame([("a", 5), ("a", None), ("b", 3)], "key string, w long")
    got = [
        (r.key, r.n_exact)
        for r in sketches.heavy_hitters_verify(nw, "key", cands, 0, k=2, weight_col="w").collect()
    ]
    assert got == [("a", 5), ("b", 3)]
