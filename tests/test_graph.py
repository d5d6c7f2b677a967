"""Graph operators: integer-exact PageRank, components, triangles."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.graph import (
    SCALE,
    connected_components,
    pagerank,
    triangle_count,
)


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


def test_connected_components_string_nodes_and_diameter(spark):
    """Two components (one a 6-hop chain, stressing multi-sweep propagation),
    labels = lexicographic min reachable node."""
    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]  # n0..n6, min label n0
    other = [("zz", "za"), ("za", "zm")]              # min label za
    edges = spark.createDataFrame(chain + other, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {**{f"n{i}": "n0" for i in range(7)},
                   **{x: "za" for x in ("zz", "za", "zm")}}


def _brute_triangles(pairs):
    """Per-node triangle counts by triple enumeration."""
    nodes = sorted({x for p in pairs for x in p})
    es = {frozenset(p) for p in pairs}
    cnt = {v: 0 for v in nodes}
    for a, b, c in combinations(nodes, 3):
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= es:
            cnt[a] += 1; cnt[b] += 1; cnt[c] += 1
    deg = {v: sum(1 for e in es if v in e) for v in nodes}
    return {v: (deg[v], cnt[v]) for v in nodes}


def test_triangle_count_k4_plus_tail(spark):
    """K4 (4 triangles, 3 per node) plus a tail node with none; input has
    duplicate and reversed edges plus a self-loop, all of which must be
    ignored."""
    k4 = [(a, b) for a, b in combinations("ABCD", 2)]
    raw = k4 + [("B", "A"), ("A", "B"), ("E", "E"), ("D", "E")]
    edges = spark.createDataFrame(raw, "src string, dst string")
    got = {r["node"]: (r["degree"], r["triangles"]) for r in triangle_count(edges).collect()}
    assert got == _brute_triangles(k4 + [("D", "E")])


def test_triangle_count_backward_closing_edge(spark):
    """A triangle whose closing edge is oriented AGAINST raw-id order:
    in {B, C, Z} the pivot is Z (degree 2 < others), and the closing edge
    B--C is oriented C -> B because deg(C) < deg(B) despite B < C. A
    wedge join that orders endpoints by raw id instead of (degree, id)
    drops this triangle; the brute-force reference keeps it honest."""
    pairs = [("B", "C"), ("B", "Z"), ("C", "Z"),
             ("B", "p"), ("B", "q"), ("B", "r"), ("C", "s"), ("C", "t")]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: (r["degree"], r["triangles"]) for r in triangle_count(edges).collect()}
    assert got == _brute_triangles(pairs)
    assert got["Z"] == (2, 1)


def test_graph_ops_random_parity(spark):
    """Seeded random graphs vs pure-Python references: union-find for
    components, triple enumeration for triangles. Catches anything the
    crafted cases miss (degree ties, isolated-ish nodes, dense pockets)."""
    import random

    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(8, 24)
        m = rng.randint(n // 2, 3 * n)
        pairs = sorted(
            {
                tuple(sorted((f"v{rng.randrange(n)}", f"v{rng.randrange(n)}")))
                for _ in range(m)
            }
        )
        pairs = [(u, v) for u, v in pairs if u != v]
        if not pairs:
            continue
        edges = spark.createDataFrame(pairs, "src string, dst string")

        got_t = {
            r["node"]: (r["degree"], r["triangles"])
            for r in triangle_count(edges).collect()
        }
        assert got_t == _brute_triangles(pairs), f"triangles trial {trial}"

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in pairs:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp = {}
        for x in parent:
            comp.setdefault(find(x), []).append(x)
        want_c = {x: min(members) for members in comp.values() for x in members}
        got_c = {
            r["node"]: r["component"] for r in connected_components(edges).collect()
        }
        assert got_c == want_c, f"components trial {trial}"


def test_graph_ops_degenerate_inputs(spark):
    """Empty edge lists and all-self-loop inputs return empty results
    instead of crashing (the guard paths a pipeline composes against)."""
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iters=3).count() == 0
    assert connected_components(empty).count() == 0
    assert triangle_count(empty).count() == 0
    loops = spark.createDataFrame([("A", "A"), ("B", "B")], "src string, dst string")
    assert triangle_count(loops).count() == 0
