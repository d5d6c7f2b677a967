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

__all__ = ["pagerank"]

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
    persisted per iteration, so the plan depth stays O(1) per iteration
    rather than O(iters) — and skewed in-degree (a celebrity node) only
    concentrates ONE reduce key, which AQE skew splitting handles.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    ).persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_int", F.lit(0).cast("long"))
    out_w = e.groupBy(F.col("__src").alias("node")).agg(
        F.sum("__w").alias("__out")
    ).persist()
    d = int(damping_pct)
    teleport = (100 - d) * SCALE // (100 * n)
    ranks = nodes.withColumn("rank_int", F.lit(SCALE // n).cast("long"))
    contrib_e = e.join(out_w.withColumnRenamed("node", "__src"), "__src")
    for _ in range(int(iters)):
        ranks = ranks.persist()
        dangling = (
            ranks.join(out_w, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank_int"), F.lit(0)).cast("long"))
            .first()[0]
        )
        share = dangling // n
        inc = (
            contrib_e.join(ranks.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank_int * __w div __out").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__inc"))
        )
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"{d} * (coalesce(__inc, 0L) + {share}L) div 100"
                )
            ).cast("long").alias("rank_int"),
        )
    return ranks
