"""Distributed graph operators: fixed-iteration integer-exact PageRank.

Iterative graph analytics on a Spark edge list — each iteration is one
keyed join (ranks x edges on src) plus one keyed aggregation (sum of
contributions by dst): the Pregel message-passing step expressed as
DataFrame ops, no driver-side loops over nodes and no RDDs. The rank
table (one small row per node) is persisted per iteration so iteration
k+1 starts from materialized ranks instead of re-running the whole
lineage k more times.

Arithmetic is INTEGER-EXACT by design (the int64-Lloyd construction the
k-means contract uses, embeddings.py): ranks are int64 mass units that
sum to ~SCALE = 10^12, contributions are floor-divided, and the damping
split is rational (85/100). Integer sums are associative and
commutative regardless of partitioning, so the result is bit-identical
on any cluster layout AND bit-identical to a SQL replay of the
iterations — no float summation-order hazard anywhere (a float PageRank
would put every node's rank a coin-flip away from a 6-dp rounding
boundary across engines). The quantization error this buys is <= 1
mass unit (1e-12 of total mass) per in-edge per iteration — far below
any ranking use.

Reference scope note: the reference engine has no graph surface; this is
net-new scale surface alongside the dedup/ANN family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "connected_components", "triangle_count"]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank with ``iters`` fixed iterations and rational
    damping ``damping_pct``/100. Returns (node, rank_int) where rank_int
    is the int64 mass (sum ~ SCALE); rank_int / 1e12 is the PageRank.

    Per iteration, for every node v:

        rank'[v] = (100-d)*SCALE // (100*n)
                   + d * (sum_{u->v} (rank[u]*w_uv // out_w[u]) + D//n) // 100

    with D = total rank mass of dangling nodes (no out-edges),
    redistributed uniformly. All divisions are int64 floor-divs; edge
    weights must be positive integers with rank*w < 2^63 (weights up to
    ~9e5 are safe at full mass).

    Scale shape: out-degrees are computed once (one groupBy on src); each
    iteration shuffles contributions on dst only; the dangling mass D is a
    single scalar aggregate per iteration (k-sized driver pull, the same
    contract as the budget optimizer's threshold scan). Node ranks are
    localCheckpoint-ed per iteration, so the plan depth stays O(1) per
    iteration rather than O(iters) — and skewed in-degree (a celebrity
    node) only concentrates ONE reduce key, which AQE skew splitting
    handles.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    # materialize the edge projection ONCE: nodes, out-weights and the
    # contribution table below each re-execute this subtree, and callers
    # commonly pass an expensive edge pipeline (q_pagerank_copurchase's
    # orders x lineitem co-purchase aggregation ran 3x before — guide §1.2;
    # per-invocation localCheckpoint, nothing persists across runs)
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    ).localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_int", F.lit(0).cast("long"))
    out_w = e.groupBy(F.col("__src").alias("node")).agg(
        F.sum("__w").alias("__out")
    ).localCheckpoint()
    d = int(damping_pct)
    teleport = (100 - d) * SCALE // (100 * n)
    ranks = nodes.withColumn("rank_int", F.lit(SCALE // n).cast("long"))
    # The weighted out-edge table is iteration-invariant: checkpoint it ONCE
    # so each iteration re-reads the materialized (src, dst, w, out) rows
    # instead of re-scanning + re-joining the raw edge list `iters` times.
    # localCheckpoint (not persist) is deliberate throughout: it truncates
    # lineage so plan depth stays O(1) per iteration, and superseded rank
    # tables are GC'd when the loop drops its reference — no `iters`-fold
    # storage leak of node-count-sized tables.
    if int(iters) > 0:
        contrib_e = e.join(
            out_w.withColumnRenamed("node", "__src"), "__src"
        ).localCheckpoint()
    for _ in range(int(iters)):
        ranks = ranks.localCheckpoint()
        # r14 OPT (guide §5): the dangling mass was a .first() driver
        # round-trip per iteration (a full extra job and a sync point);
        # as a broadcast one-row aggregate it executes inside the SAME job
        # that materializes the next rank table. `__dang div n` is the
        # identical int64 floor-div the driver computed (dangling >= 0).
        dang = ranks.join(out_w, "node", "left_anti").agg(
            F.coalesce(F.sum("rank_int"), F.lit(0)).cast("long").alias("__dang")
        )
        inc = (
            contrib_e.join(ranks.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank_int * __w div __out").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__inc"))
        )
        ranks = (
            nodes.join(inc, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{d} * (coalesce(__inc, 0L) + __dang div {n}L) div 100"
                    )
                ).cast("long").alias("rank_int"),
            )
        )
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list of
    arbitrary orderable node type (string labels, longs, ...). Returns
    (node, component) where component is the MINIMUM node id reachable from
    the node — a deterministic, layout-independent representative.

    Alternating min-label propagation (the dedup.dup_clusters construction
    generalized off long ids): each sweep is one keyed join (labels onto
    edge sources) plus one groupBy-min on destination — uniform shuffles
    only, no single-task stage — converging in O(component diameter)
    sweeps. Labels are localCheckpoint-ed per sweep so plan depth stays
    O(1) per sweep; convergence is detected by a sweep that lowers no
    label (a scalar aggregate per sweep, the same k-sized driver pull
    contract as pagerank's dangling mass). Extra sweeps past the fixed
    point are no-ops (min is monotone + idempotent), which is what lets a
    SQL oracle replay a fixed unroll.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint()
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    labels = labels.localCheckpoint()
    for _ in range(int(max_iters)):
        prop = (
            und.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("nlab"))
        )
        joined = labels.join(prop, "node", "left").select(
            "node",
            F.least(F.col("component"), F.coalesce("nlab", "component")).alias("component"),
            (F.coalesce("nlab", "component") < F.col("component")).cast("long").alias("__low"),
        )
        joined = joined.localCheckpoint()
        changed = int(joined.agg(F.sum("__low")).collect()[0][0] or 0)
        labels = joined.drop("__low")
        if changed == 0:
            break
    return labels


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts of an undirected simple graph. Returns
    (node, degree, triangles) for every node of the deduplicated edge list.

    The distributed degree-orientation algorithm (the shape GraphX and the
    MR triangle literature use): order nodes by (degree, id) and orient
    every edge from the smaller endpoint. Out-degrees are then bounded by
    O(sqrt(E)), so the wedge self-join — pairs of oriented edges sharing a
    pivot, with the second endpoint (degree, id)-greater than the first —
    enumerates O(E^1.5) candidate wedges worst-case instead of
    sum(deg^2), and each triangle is generated EXACTLY once: its
    (degree, id)-smallest corner is the pivot, and the closing edge
    between the two remaining corners is oriented (smaller -> greater),
    so one equi-join on (b1, b2) confirms it. Everything is keyed
    joins/aggs — no cartesian, no driver loop; the orientation comparison
    must use the SAME (degree, id) tuple order in the wedge condition as
    in the edge orientation, else triangles whose closing edge points
    'backwards' are silently dropped (raw-id wedge ordering undercounts).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    pairs = (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        # materialize: `pairs` is referenced twice below (und + oriented)
        # and `oriented` three times — Spark does not share common
        # subtrees across references, so an expensive caller-side edge
        # pipeline (q_part_triangles' basket self-join) would otherwise be
        # re-scanned up to 5x (r14 OPT; plan dropped ~520 textual
        # Exchanges to 14, 13.6 s -> ~4 s warm at sf0.1)
        .localCheckpoint()
    )
    und = pairs.unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # r14 OPT (guide §5 reuse): deg is read 3x (both orientation sides + the
    # final left join); one node-count-sized table beats three groupBy
    # passes over the 2|E| undirected list
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    ).localCheckpoint()
    # Orient u -> v iff (deg(u), u) < (deg(v), v); carry the head's (deg, id)
    # so the wedge join can compare in the SAME order.
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        pairs.join(du, "u").join(dv, "v")
        .select(
            F.when(lt, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lt, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(lt, F.col("dv")).otherwise(F.col("du")).alias("db"),
        )
        .localCheckpoint()  # read 3x below: wedge sides e1/e2 + closing
    )
    e1 = oriented.select(F.col("a"), F.col("b").alias("b1"), F.col("db").alias("db1"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("b2"), F.col("db").alias("db2"))
    wedges = e1.join(e2, "a").filter(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
    )
    closing = oriented.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tris = wedges.join(closing, ["b1", "b2"]).select("a", "b1", "b2")
    # r14 OPT (guide §7.2 duplicated subtrees): the corner tally was a 3-way
    # union of selects over `tris` — Spark does not share common subtrees
    # across union branches, so the O(E^1.5) wedge join + closing join
    # re-executed per branch (two extra 7.5M-row SortMergeJoins in the sf0.1
    # plan). One explode emits the identical corner multiset in a single
    # pass over the triangle list.
    corner = (
        tris.select(F.explode(F.array("a", "b1", "b2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(corner, "node", "left").select(
        "node", "degree", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )
