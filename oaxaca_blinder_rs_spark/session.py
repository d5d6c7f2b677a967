"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are what
we would ship as defaults on a real cluster (AQE on, adaptive skew-join on,
sane shuffle partitioning). Nothing here is required — every public API takes
an externally-built SparkSession/DataFrame too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "oaxaca-blinder-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one of the driver-provided parquet tables (TESTDATA.md).

    The `events` table carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects ([PARQUET_TYPE_ILLEGAL]); fall back to pyarrow -> pandas (ns
    timestamps downcast to us) -> createDataFrame for such files.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so the parquet footer is actually checked
        return df
    except Exception:
        import pyarrow.parquet as pq

        pdf = pq.read_table(path).to_pandas()
        return spark.createDataFrame(pdf)
