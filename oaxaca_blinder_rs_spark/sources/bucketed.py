"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Spark's native bucketing removes it: write each table hash-bucketed
(and optionally sorted) on the join key; a join between two tables with the
same bucket count and key then reads bucket i against bucket i directly —
no Exchange on either side (plan-asserted in tests/test_plans.py).

These helpers wrap the write/read pair so pipelines can materialize their
hot join keys once and reuse the layout across queries — the batch
equivalent of an index. Bucket metadata lives in the session catalog;
``register_bucketed`` re-attaches an existing on-disk layout after a
restart, so the layout investment survives the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "register_bucketed"]


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed parquet table ``name`` at ``path``.

    bucket_cols: the join/aggregation key(s) to co-locate on. num_buckets
    must match on both sides of a shuffle-free join — pick it once per
    subject area (rule of thumb: total size / target 128-256 MB per bucket
    per file). sort_cols additionally sorts within buckets, upgrading the
    join to a zip of pre-sorted runs (no sort at read time).
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(int(num_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Re-attach an existing bucketed layout to a fresh session's catalog.

    ``saveAsTable`` metadata is per-catalog; after a restart the files are
    still bucketed but the catalog no longer knows. This issues the
    equivalent CREATE TABLE ... USING parquet CLUSTERED BY ... LOCATION
    statement so joins regain the no-shuffle plan.
    """
    cluster = ", ".join(f"`{c}`" for c in bucket_cols)
    sort = f" SORTED BY ({', '.join(f'`{c}`' for c in sort_cols)})" if sort_cols else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{name}` ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({cluster}){sort} INTO {int(num_buckets)} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(name)
