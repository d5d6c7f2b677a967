"""Raw-text source (LLM training-data ingest).

Two layouts cover the common corpus-on-disk shapes:

- ``read_text_lines``: one document per line (the txt sibling of JSONL) —
  a thin veneer over Spark's splittable text scan plus the shuffle-free
  stable row ids shared with the CSV/JSONL sources;
- ``read_text_files``: one document per FILE (``wholetext``) with the source
  path attached — the layout web-crawl dumps and book corpora use. Whole
  files are not splittable, so parallelism = file count; right for
  many-small-files corpora, wrong for one giant file (use the line reader).

Both keep ingest pure-JVM: no Python touches the bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .csv import attach_row_ids

__all__ = ["read_text_lines", "read_text_files"]


def read_text_lines(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    with_row_id: bool = True,
    drop_blank: bool = True,
) -> DataFrame:
    """One document per line: (text [, row id]). Blank lines are dropped by
    default (trailing-newline artifacts read as empty documents)."""
    df = spark.read.text(path).withColumnRenamed("value", text_col)
    if drop_blank:
        df = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    if with_row_id:
        df = attach_row_ids(df)
    return df


def read_text_files(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    path_col: str = "source_path",
    with_row_id: bool = True,
) -> DataFrame:
    """One document per file: (source_path, text [, row id])."""
    df = (
        spark.read.text(path, wholetext=True)
        .withColumnRenamed("value", text_col)
        .withColumn(path_col, F.input_file_name())
        .select(path_col, text_col)
    )
    if with_row_id:
        df = attach_row_ids(df)
    return df
