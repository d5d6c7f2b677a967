"""Bucketed-table co-location: the join of two tables bucketed on the same
key/count must plan WITHOUT an Exchange on either side."""

import re

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.sources.bucketed import register_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], 8, str(tmp_path / "li_b"),
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, str(tmp_path / "orders_b"),
                   sort_cols=["o_orderkey"])
    yield li, orders
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def _join_plan(spark):
    import contextlib
    import io

    a = spark.table("li_b")
    b = spark.table("orders_b")
    joined = a.join(b, a["l_orderkey"] == b["o_orderkey"]).groupBy("l_orderkey").agg(
        F.sum("l_extendedprice").alias("rev")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    return joined, buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, plan = _join_plan(spark)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # neither join input is exchanged: buckets line up 1:1
        assert len(re.findall(r"\(\d+\) Exchange", join_section)) == 0, plan
        # values match the plain (shuffled) join
        li, orders = bucketed_pair
        expected = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_orderkey")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        got = {r["l_orderkey"]: r["rev"] for r in joined.collect()}
        want = {r["l_orderkey"]: r["rev"] for r in expected.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_register_bucketed_reattaches_layout(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    path = str(tmp_path / "li_rb")
    write_bucketed(li, "li_rb_w", ["l_orderkey"], 4, path)
    spark.sql("DROP TABLE li_rb_w")  # catalog forgets; files remain
    df = register_bucketed(
        spark, "li_rb", path, "l_orderkey BIGINT, l_quantity DOUBLE",
        ["l_orderkey"], 4,
    )
    try:
        assert df.count() == li.count()
        desc = spark.sql("DESCRIBE TABLE EXTENDED li_rb").collect()
        txt = "\n".join(f"{r['col_name']} {r['data_type']}" for r in desc)
        assert "Num Buckets 4" in txt and "l_orderkey" in txt
    finally:
        spark.sql("DROP TABLE IF EXISTS li_rb")


def test_write_bucketed_rejects_empty_key(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError):
        write_bucketed(li, "x", [], 4, str(tmp_path / "x"))
