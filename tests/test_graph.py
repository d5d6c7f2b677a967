"""Integer-exact PageRank (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.graph import SCALE, pagerank


def _reference_pagerank(edge_list, iters, d=85):
    """Independent dict-based replay of the integer recurrence."""
    nodes = sorted({u for u, _, _ in edge_list} | {v for _, v, _ in edge_list})
    n = len(nodes)
    out = {}
    for u, _, w in edge_list:
        out[u] = out.get(u, 0) + w
    r = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        inc = {v: 0 for v in nodes}
        for u, v, w in edge_list:
            inc[v] += (r[u] * w) // out[u]
        r = {
            v: (100 - d) * SCALE // (100 * n)
            + (d * (inc[v] + dang // n)) // 100
            for v in nodes
        }
    return r


def test_pagerank_matches_reference_with_dangling_and_weights(spark):
    """A weighted triangle-with-dangling graph: B gets most of A's mass via
    the heavy edge; C is dangling and redistributes uniformly. Engine must
    equal the independent dict replay bit-for-bit."""
    edge_list = [("A", "B", 3), ("A", "C", 1), ("B", "A", 1)]
    edges = spark.createDataFrame(edge_list, "src string, dst string, w long")
    got = {r["node"]: r["rank_int"] for r in pagerank(edges, iters=4, weight="w").collect()}
    assert got == _reference_pagerank(edge_list, 4)
    # sanity on the ordering the math implies
    assert got["B"] > got["C"]


def test_pagerank_unweighted_default_and_zero_iters(spark):
    edge_list = [("A", "B", 1), ("B", "A", 1)]
    edges = spark.createDataFrame(
        [(u, v) for u, v, _ in edge_list], "src string, dst string"
    )
    got0 = {r["node"]: r["rank_int"] for r in pagerank(edges, iters=0).collect()}
    assert got0 == {"A": SCALE // 2, "B": SCALE // 2}
    got3 = {r["node"]: r["rank_int"] for r in pagerank(edges, iters=3).collect()}
    assert got3 == _reference_pagerank(edge_list, 3)


def test_pagerank_mass_conservation_and_determinism(spark, sf_dir):
    """Total mass stays within iters * n quantization units of SCALE, and
    two runs over different input partitionings are bit-identical (the
    integer-exactness claim)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = (
        ev.groupBy(
            F.col("user_id").alias("src"),
            F.xxhash64("event_type").alias("dst"),
        ).agg(F.count(F.lit(1)).alias("w"))
    )
    a = sorted(map(tuple, pagerank(edges, iters=3, weight="w").collect()))
    b = sorted(
        map(tuple, pagerank(edges.repartition(13), iters=3, weight="w").collect())
    )
    assert a == b
    n = len(a)
    mass = sum(r for _, r in a)
    assert SCALE - 3 * (n + 2) * 100 <= mass <= SCALE


def test_pagerank_validates_args(spark):
    edges = spark.createDataFrame([("A", "B")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(edges, iters=-1)
    with pytest.raises(ValueError):
        pagerank(edges, damping_pct=101)
