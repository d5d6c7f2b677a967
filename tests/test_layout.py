"""Z-order layout tests (operators/layout.py, round 6)."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.layout import zorder_index, zorder_repartition


def test_zorder_interleave_hand_values(spark):
    """Bit-exact Morton interleave: hand-computed values for 2 columns."""
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in df.select(
        "a", "b", zorder_index([F.col("a"), F.col("b")], bits=16).alias("z")
    ).collect()}
    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b)
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_locality_beats_single_column_sort(spark, sf_dir):
    """The point of z-order: range-partitioned-by-z files have tighter
    min-max zones across BOTH dimensions than a single-column sort. Proxy
    metric: sum over partitions of (range_a + range_b) must shrink vs
    sorting by a alone."""
    raw = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # min-max scale BOTH dimensions to the same 10-bit range — z-order
    # assumes comparable per-dimension scales (as any real OPTIMIZE ZORDER
    # quantizer does); wildly different ranges make the interleave skewed
    lim = raw.agg(
        F.min("c_acctbal").alias("lo_a"), F.max("c_acctbal").alias("hi_a"),
        F.min("c_custkey").alias("lo_b"), F.max("c_custkey").alias("hi_b"),
    )
    cust = raw.crossJoin(F.broadcast(lim)).select(
        F.floor(
            (F.col("c_acctbal") - F.col("lo_a")) / (F.col("hi_a") - F.col("lo_a") + 1e-9) * 1023
        ).cast("long").alias("a"),
        F.floor(
            (F.col("c_custkey") - F.col("lo_b")) / (F.col("hi_b") - F.col("lo_b") + 1e-9) * 1023
        ).cast("long").alias("b"),
    )
    nparts = 16

    def zone_cost(df):
        stats = (
            df.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(
                (F.max("a") - F.min("a")).alias("ra"),
                (F.max("b") - F.min("b")).alias("rb"),
            )
            .agg(F.sum(F.col("ra") + F.col("rb")).alias("c"))
            .collect()[0]["c"]
        )
        return stats

    by_a = cust.repartitionByRange(nparts, "a")
    by_z = zorder_repartition(cust, [F.col("a"), F.col("b")], nparts, bits=10)
    assert zone_cost(by_z.select("a", "b")) < zone_cost(by_a)


def test_zorder_validation(spark):
    with pytest.raises(ValueError):
        zorder_index([], bits=16)
    with pytest.raises(ValueError):
        zorder_index([F.lit(1)] * 4, bits=16)  # 64 bits > 62


def test_hilbert_matches_pure_python_walk(spark):
    """hilbert_index (r9) vs the classic iterative xy2d reference on random
    coordinates at bits=8 and bits=16, plus bijectivity + unit-step
    adjacency on the full 4x4 grid (the defining Hilbert property Morton
    lacks)."""
    import random

    from oaxaca_blinder_rs_spark.operators.layout import hilbert_index

    def xy2d(order_bits, x, y):
        n = 1 << order_bits
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(3)
    for bits, cnt in [(8, 2000), (16, 400)]:
        rows = [
            (i, rng.randrange(1 << bits), rng.randrange(1 << bits))
            for i in range(cnt)
        ]
        df = spark.createDataFrame(rows, "i long, x long, y long")
        got = {
            r["i"]: r["h"]
            for r in df.select(
                "i", hilbert_index(F.col("x"), F.col("y"), bits).alias("h")
            ).collect()
        }
        assert got == {i: xy2d(bits, x, y) for i, x, y in rows}, bits

    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    walk = {
        r["h"]: (r["x"], r["y"])
        for r in grid.select(
            "x", "y", hilbert_index(F.col("x"), F.col("y"), 2).alias("h")
        ).collect()
    }
    assert sorted(walk) == list(range(16))  # bijective
    for i in range(15):  # unit steps only
        (x0, y0), (x1, y1) = walk[i], walk[i + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1

    with pytest.raises(ValueError):
        hilbert_index(F.lit(1), F.lit(1), bits=32)


def test_hilbert_locality_beats_morton(spark, sf_dir):
    """Hilbert's unit-step walk should give min-max zones at least as tight
    as Morton's on the same quantized plane (the reason liquid clustering
    moved to it) — and strictly tighter than a single-column sort."""
    from oaxaca_blinder_rs_spark.operators.layout import hilbert_repartition

    raw = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lim = raw.agg(
        F.min("c_acctbal").alias("lo_a"), F.max("c_acctbal").alias("hi_a"),
        F.min("c_custkey").alias("lo_b"), F.max("c_custkey").alias("hi_b"),
    )
    cust = raw.crossJoin(F.broadcast(lim)).select(
        F.floor(
            (F.col("c_acctbal") - F.col("lo_a")) / (F.col("hi_a") - F.col("lo_a") + 1e-9) * 1023
        ).cast("long").alias("a"),
        F.floor(
            (F.col("c_custkey") - F.col("lo_b")) / (F.col("hi_b") - F.col("lo_b") + 1e-9) * 1023
        ).cast("long").alias("b"),
    )
    nparts = 16

    def zone_cost(df):
        return (
            df.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(
                (F.max("a") - F.min("a")).alias("ra"),
                (F.max("b") - F.min("b")).alias("rb"),
            )
            .agg(F.sum(F.col("ra") + F.col("rb")).alias("c"))
            .collect()[0]["c"]
        )

    by_a = cust.repartitionByRange(nparts, "a")
    by_h = hilbert_repartition(cust, F.col("a"), F.col("b"), nparts, bits=10)
    by_z = zorder_repartition(cust, [F.col("a"), F.col("b")], nparts, bits=10)
    cost_h = zone_cost(by_h.select("a", "b"))
    cost_z = zone_cost(by_z.select("a", "b"))
    assert cost_h < zone_cost(by_a)
    assert cost_h <= cost_z
