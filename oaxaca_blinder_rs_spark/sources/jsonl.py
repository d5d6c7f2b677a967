"""JSONL source (LLM training-data ingest).

JSON Lines is the de-facto interchange format for document corpora; the
reader is a thin veneer over Spark's native json scan (splittable,
schema-inferring or schema-pinned, predicate/column pruning intact) plus
the same shuffle-free stable row ids as the CSV source. Malformed lines
follow Spark's PERMISSIVE default and can be surfaced via
``corrupt_col`` for quarantine pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .csv import attach_row_ids

__all__ = ["read_jsonl", "write_jsonl"]


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    with_row_id: bool = True,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read newline-delimited JSON into a DataFrame.

    schema: optional DDL string or StructType — pin it in production so the
    scan skips inference (one fewer pass) and prunes columns at the source.
    corrupt_col: when set, malformed lines land in this column instead of
    being nulled field-by-field (Spark PERMISSIVE semantics).
    """
    reader = spark.read
    if corrupt_col is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        df = reader.schema(schema).json(path)
    else:
        df = reader.json(path)
    if with_row_id:
        df = attach_row_ids(df)
    return df


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partitions: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a DataFrame as newline-delimited JSON — the corpus interchange
    format's OUT face (read_jsonl is the IN face; jsonl_roundtrip contracts
    the pair's losslessness on the documents table).

    partitions: optional coalesce before the write (JSONL consumers often
    want a bounded file count; coalesce avoids a shuffle — use a full
    repartition upstream if write parallelism matters more than file
    count). compression: e.g. 'gzip' — splittability is lost for gzip, so
    prefer none or 'zstd'-capable lakes at 100 TB.
    """
    out = df.coalesce(int(partitions)) if partitions else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
