"""NumPy-oracle parity tests for the embedding transforms
(operators/embeddings.py) on the driver-generated embeddings table."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators import embeddings as emb


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = df.select("vec_id", "embedding").collect()
    mat = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    return df, mat


def test_l2_normalize_unit_norms(spark, vecs):
    df, mat = vecs
    out = df.select(
        "vec_id", emb.l2_normalize(F.col("embedding")).alias("nv")
    ).collect()
    for r in out:
        v = np.asarray(r["nv"])
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-9)
        expected = mat[r["vec_id"]] / np.linalg.norm(mat[r["vec_id"]])
        assert np.allclose(v, expected, atol=1e-9)


def test_mean_pool_matches_numpy(spark, vecs):
    df, mat = vecs
    grouped = df.withColumn("g", (F.col("vec_id") % 3).cast("int"))
    out = {r["g"]: np.asarray(r["pooled"]) for r in emb.mean_pool(grouped, "g").collect()}
    for g in range(3):
        members = np.array([v for i, v in mat.items() if i % 3 == g])
        assert np.allclose(out[g], members.mean(axis=0), atol=1e-9)


def test_embedding_covariance_matches_numpy(spark, vecs):
    df, mat = vecs
    cov, mean, n = emb.embedding_covariance(df.repartition(7))
    x = np.array([mat[i] for i in sorted(mat)])
    assert n == len(x)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-10)
    assert np.allclose(cov, np.cov(x, rowvar=False, ddof=1), atol=1e-8)


def test_pca_whiten_matches_numpy_and_whitens(spark, vecs):
    df, mat = vecs
    m = 8
    out = {
        r["vec_id"]: np.asarray(r["whitened"])
        for r in emb.pca_whiten(df.repartition(5), n_components=m).collect()
    }
    x = np.array([mat[i] for i in sorted(mat)])
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs_ = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:m]
    vals, vecs_ = vals[order], vecs_[:, order]
    for j in range(m):
        i = int(np.argmax(np.abs(vecs_[:, j])))
        if vecs_[i, j] < 0:
            vecs_[:, j] = -vecs_[:, j]
    expected = (x - mu) @ (vecs_ / np.sqrt(np.maximum(vals, 1e-9)))
    got = np.array([out[i] for i in sorted(mat)])
    assert got.shape == (len(x), m)
    assert np.allclose(got, expected, atol=1e-6)
    # whitened covariance is the identity on the fitted data
    wcov = np.cov(got, rowvar=False, ddof=1)
    assert np.allclose(wcov, np.eye(m), atol=1e-6)


def test_pca_whiten_deterministic_across_partitionings(spark, vecs):
    df, _ = vecs
    a = {r["vec_id"]: tuple(r["whitened"]) for r in emb.pca_whiten(df.repartition(3), 4).collect()}
    b = {r["vec_id"]: tuple(r["whitened"]) for r in emb.pca_whiten(df.repartition(11), 4).collect()}
    assert set(a) == set(b)
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-9)


def _kmeans_numpy(mat, k, iters, scale=1000):
    ids = sorted(mat)
    X = np.floor(np.array([mat[i] for i in ids]) * scale).astype(np.int64)
    cents = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = []
        for c in range(k):
            sel = X[a == c]
            if len(sel):
                new.append(sel.sum(axis=0) // len(sel))  # floor division
            else:
                new.append(cents[c])
        cents = np.array(new, dtype=np.int64)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return dict(zip(ids, d.argmin(axis=1))), cents


def test_kmeans_quantized_matches_numpy(spark, vecs):
    df, mat = vecs
    assigns, cents = emb.kmeans_quantized(df.repartition(7), k=5, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in assigns.collect()}
    want, want_cents = _kmeans_numpy(mat, k=5, iters=3)
    assert got == want
    assert np.array_equal(np.array(cents, dtype=np.int64), want_cents)
    assert len(set(got.values())) > 1  # actually clusters


def test_kmeans_quantized_partitioning_invariant(spark, vecs):
    df, _ = vecs
    a, ca = emb.kmeans_quantized(df.repartition(3), k=4, iters=2)
    b, cb = emb.kmeans_quantized(df.repartition(13), k=4, iters=2)
    assert {r["vec_id"]: r["cluster"] for r in a.collect()} == {
        r["vec_id"]: r["cluster"] for r in b.collect()
    }
    assert ca == cb


def test_kmeans_quantized_validates(spark, vecs):
    df, _ = vecs
    with pytest.raises(ValueError):
        emb.kmeans_quantized(df, k=0)
    with pytest.raises(ValueError):
        emb.kmeans_quantized(df.limit(2), k=5)


def test_diversity_sample_quota_and_determinism(spark, vecs):
    df, _ = vecs
    out = emb.diversity_sample(df, n_per_cluster=5, k=4, iters=2)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster"], []).append(r["vec_id"])
    assert all(len(v) <= 5 for v in per.values())
    assert len(per) > 1
    again = {(r["vec_id"], r["cluster"]) for r in
             emb.diversity_sample(df.repartition(9), n_per_cluster=5, k=4, iters=2).collect()}
    assert {(r["vec_id"], r["cluster"]) for r in rows} == again


def test_semantic_dedup_blocks_by_cluster_and_keeps_lowest_id(spark):
    """SemDeDup semantics on a hand case: two tight groups far apart.
    Within a cluster, every vector with a lower-id neighbor at cosine >=
    threshold is dropped with dup_of = the MINIMUM such id; near-dups that
    land in DIFFERENT clusters are NOT compared (clustering is the blocking
    structure — the documented recall trade of the paper's design)."""
    from oaxaca_blinder_rs_spark.operators import embeddings as emb

    # group 1 around +e1, group 2 around +e2; ids interleaved to make the
    # lowest-id rule observable; 64-dim to match the kmeans oracle shape
    def vec(axis, eps, j):
        v = [0.0] * 64
        v[axis] = 1.0
        v[(axis + 2 + j) % 64] = eps
        return v

    rows = [
        (0, vec(0, 0.00, 0)),   # g1 representative
        (1, vec(1, 0.00, 0)),   # g2 representative
        (2, vec(0, 0.01, 1)),   # ~cos 0.99995 with id 0 -> dropped, dup_of 0
        (3, vec(1, 0.01, 1)),   # dup of id 1 -> dropped, dup_of 1
        (4, vec(0, 0.30, 2)),   # cos ~0.958 with id 0: kept at thr 0.99
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in emb.semantic_dedup(df, k=2, iters=2, threshold=0.99).collect()}
    assert len(out) == 5  # one row per input
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert out[1]["keep"] and out[1]["dup_of"] is None
    assert not out[2]["keep"] and out[2]["dup_of"] == 0
    assert not out[3]["keep"] and out[3]["dup_of"] == 1
    assert out[4]["keep"]
    # same-cluster co-membership for the dup pairs (blocking sanity)
    assert out[2]["cluster"] == out[0]["cluster"]
    assert out[3]["cluster"] == out[1]["cluster"]
    # determinism across partitionings (integer kmeans + pure expressions)
    again = {r["vec_id"]: (r["cluster"], r["keep"], r["dup_of"])
             for r in emb.semantic_dedup(df.repartition(7), k=2, iters=2, threshold=0.99).collect()}
    assert again == {i: (out[i]["cluster"], out[i]["keep"], out[i]["dup_of"]) for i in out}


def test_semantic_dedup_derived_k_blocking_bound(spark):
    """k=None derives k = ceil(n / target_cluster_size) — the SemDeDup
    scaling rule the r8 verdict asked to move from the docstring into the
    default: a forgotten k can no longer leave 8 blocks over an arbitrarily
    large corpus. The derived path must (a) equal the explicit-k run
    row-for-row, (b) keep every cluster id inside [0, k), the blocking
    bound the candidate-volume argument rests on."""
    from oaxaca_blinder_rs_spark.operators import embeddings as emb

    def vec(axis, eps, j):
        v = [0.0] * 64
        v[axis] = 1.0
        v[(axis + 2 + j) % 64] = eps
        return v

    rows = [(i, vec(i % 3, 0.01 * (i % 5), i)) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # n=10, target 3 -> derived k = ceil(10/3) = 4
    derived = emb.semantic_dedup(df, threshold=0.99, target_cluster_size=3)
    explicit = emb.semantic_dedup(df, k=4, threshold=0.99)
    d = {r["vec_id"]: (r["cluster"], r["keep"], r["dup_of"]) for r in derived.collect()}
    e = {r["vec_id"]: (r["cluster"], r["keep"], r["dup_of"]) for r in explicit.collect()}
    assert d == e
    assert all(0 <= c < 4 for c, _, _ in d.values())
    # target >= n collapses to k=1 (single block), never k=0
    one = emb.semantic_dedup(df, threshold=0.99, target_cluster_size=100)
    assert {r["cluster"] for r in one.collect()} == {0}
    import pytest

    with pytest.raises(ValueError, match="target_cluster_size"):
        emb.semantic_dedup(df, threshold=0.99, target_cluster_size=0)


def test_embedding_outliers_rank_and_invariance(spark):
    """Centroid-distance outlier ranks: rank 1 is the farthest vector in
    its cluster (ties by id), every row is ranked 1..|cluster| exactly
    once, dist2 is the exact integer distance, and results are identical
    across partitionings (integer arithmetic + distributed grouped rank)."""
    from oaxaca_blinder_rs_spark.operators import embeddings as emb

    def vec(axis, eps, j):
        v = [0.0] * 64
        v[axis] = 1.0
        v[(axis + 2 + j) % 64] = eps
        return v

    rows = [
        (0, vec(0, 0.00, 0)), (1, vec(1, 0.00, 0)),
        (2, vec(0, 0.01, 1)), (3, vec(1, 0.01, 1)),
        (4, vec(0, 0.30, 2)),  # clearly farthest from the axis-0 centroid
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in emb.embedding_outliers(df, k=2, iters=2).collect()}
    assert len(out) == 5
    # per-cluster ranks are a permutation of 1..|cluster|
    by_cluster = {}
    for r in out.values():
        by_cluster.setdefault(r["cluster"], []).append(r["cluster_rank"])
    for c, ranks in by_cluster.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (c, ranks)
    # id 4 (eps 0.30) is the farthest member of id 0's cluster
    c0 = out[0]["cluster"]
    assert out[4]["cluster"] == c0
    farthest = max(
        (r for r in out.values() if r["cluster"] == c0),
        key=lambda r: (r["dist2"], -r["vec_id"]),
    )
    assert farthest["vec_id"] == 4 and out[4]["cluster_rank"] == 1
    # exact-integer determinism across partitionings
    again = {r["vec_id"]: (r["cluster"], r["dist2"], r["cluster_rank"])
             for r in emb.embedding_outliers(df.repartition(7), k=2, iters=2).collect()}
    assert again == {i: (out[i]["cluster"], out[i]["dist2"], out[i]["cluster_rank"]) for i in out}


def test_embedding_outliers_rank_key_range_guard(spark):
    """The fixed-width rank key is an order-embedding only on
    [0, 1e18) x [0, 1e18); out-of-range inputs (negative ids, or a huge
    `scale` overflowing dist2) must raise loudly instead of silently
    corrupting cluster_rank (r8 ADVICE item)."""
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401
    from py4j.protocol import Py4JJavaError  # noqa: F401

    from oaxaca_blinder_rs_spark.operators import embeddings as emb

    def vec(axis):
        v = [0.0] * 8
        v[axis] = 1.0
        return v

    bad_ids = spark.createDataFrame(
        [(-1, vec(0)), (2, vec(1)), (3, vec(0))],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="rank key out of range"):
        emb.embedding_outliers(bad_ids, k=2, iters=1).collect()
    # a scale large enough to push a unit-vector distance past 1e18 while
    # staying under Long.MAX (with k=1 the centroid is the midpoint, so
    # dist2 = 2 * (scale/2 * 2)^2 ... = 2e18 at scale 2e9; anything larger trips
    # Spark's ANSI int64-overflow ArithmeticException even earlier, also loud)
    big = spark.createDataFrame(
        [(0, vec(0)), (1, vec(1))], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="rank key out of range"):
        emb.embedding_outliers(big, k=1, iters=1, scale=2 * 10**9).collect()


def test_pca_whiten_invariants_contract_row(spark, sf_dir):
    """The r9 invariant contract for the d=64 whitening: the 66x66
    combined-covariance pass must report exactly (0, 1, 0, 0, true, true)
    per component at 6 dp on the real embeddings table — the values an
    independent engine knows a priori (see q_pca_whiten_invariants)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    rows = sorted(
        entry_mod.q_pca_whiten_invariants(spark, sf_dir).collect(),
        key=lambda r: r["comp"],
    )
    assert [tuple(r) for r in rows] == [
        (0, 0.0, 1.0, 0.0, 0.0, True, True),
        (1, 0.0, 1.0, 0.0, 0.0, True, True),
    ]
