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
