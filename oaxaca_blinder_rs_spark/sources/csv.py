"""CSV sources (SURVEY S1-S3).

- read_csv: header-ful CSV path -> DataFrame with inferred schema
  (main.rs:162-165 LazyCsvReader semantics) plus a stable __ob_row_id__
  reflecting input order (SURVEY §7.5 risk 1).
- read_csv_bytes: in-memory CSV text/bytes -> DataFrame
  (engine/src/analysis.rs:10-11 Cursor reader) — pandas->Arrow->Spark.
- strict_numeric_cast re-exported from engine_ops (S3).
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.engine_ops import strict_numeric_cast  # noqa: F401

__all__ = ["read_csv", "read_csv_bytes", "strict_numeric_cast"]

ROW_ID = "__ob_row_id__"


def read_csv(spark: SparkSession, path: str, with_row_id: bool = True) -> DataFrame:
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    if with_row_id:
        # monotonically_increasing_id preserves file order within partitions;
        # re-rank it into a dense 0..n-1 id so downstream ops can address rows
        # exactly like the reference's positional indices
        df = df.withColumn("__mid", F.monotonically_increasing_id())
        df = df.withColumn(ROW_ID, F.row_number().over(Window.orderBy("__mid")) - 1).drop("__mid")
    return df


def read_csv_bytes(spark: SparkSession, data: bytes | str, with_row_id: bool = True) -> DataFrame:
    import pandas as pd

    if isinstance(data, bytes):
        buf = io.BytesIO(data)
    else:
        buf = io.StringIO(data)
    pdf = pd.read_csv(buf)
    if with_row_id:
        pdf[ROW_ID] = range(len(pdf))
    return spark.createDataFrame(pdf)
