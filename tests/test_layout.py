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
