"""salted_join: result parity with the plain join and salt-spread checks."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows share key 7 — the hot-key shape salting exists for
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(50)], "k long, name string"
    )
    return fact, dim


def _key_counts(df):
    return {
        (r["k"], r["v"]): r["c"]
        for r in df.groupBy("k", "v").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_salted_inner_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", salt=8)
    assert _key_counts(plain.select("k", "v")) == _key_counts(salted.select("k", "v"))
    assert sorted(salted.columns) == sorted(plain.columns)


def test_salted_left_keeps_unmatched(spark, skewed):
    fact, dim = skewed
    # drop key 7 from the dim: the hot rows must survive with null name
    dim2 = dim.filter(F.col("k") != 7)
    out = salted_join(fact, dim2, "k", salt=4, how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("name").isNull()).count() == fact.filter(F.col("k") == 7).count()


def test_salt_spreads_hot_key(spark, skewed):
    fact, _ = skewed
    big_s = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(8))
    )
    spread = (
        big_s.filter(F.col("k") == 7).groupBy("__salt").count().collect()
    )
    # the hot key occupies (nearly) all 8 salt buckets, none dominant
    assert len(spread) >= 7
    counts = [r["count"] for r in spread]
    assert max(counts) < 0.5 * sum(counts)


def test_salted_join_validates_args(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", salt=0)
