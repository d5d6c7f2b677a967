"""ORC source/sink (net-new source format; no reference analogue).

ORC ships inside Spark's JVM (no extra package, unlike Avro), reads with
predicate pushdown + column pruning like parquet, and is the other columnar
format a 100 TB lake commonly holds. Same stable-row-id contract as the CSV
source (sources/csv.py:attach_row_ids — shuffle-free dense ids), so every
row-id-keyed operator (point mutation, matching, verify adjustments) works
unchanged on ORC inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .csv import attach_row_ids

__all__ = ["read_orc", "write_orc"]


def read_orc(spark: SparkSession, path: str, with_row_id: bool = True) -> DataFrame:
    """Read an ORC file/directory; optionally attach dense input-order ids."""
    df = spark.read.orc(path)
    if with_row_id:
        df = attach_row_ids(df)
    return df


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ORC with zstd (Spark's best size/speed codec for ORC).

    ``partition_by`` produces hive-style directory partitioning so
    downstream reads prune partitions from the path filter alone.
    """
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
