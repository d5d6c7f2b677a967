"""Data-layout primitives: z-order (Morton) clustering for multi-column
locality (net-new scale surface).

At 100 TB, scan cost is dominated by how well file/row-group min-max zones
prune. Sorting by one column prunes only that column; interleaving the bits
of several columns (the Morton / z-order curve, as in Delta/Iceberg
OPTIMIZE ZORDER) keeps rows close in EVERY dimension close in the file
order, so multi-predicate scans skip most of the data.

Everything here is exact integer bit arithmetic over pre-quantized
columns, so the DuckDB oracle replays the index bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_index", "zorder_repartition"]


def zorder_index(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of up to 4 pre-quantized integer columns.

    Each input must already be an integer in [0, 2^bits) — quantize
    explicitly upstream (e.g. ``F.round(x * 100) % (1 << bits)``) so the
    mapping is deterministic and engine-portable. Output bit 2i (for two
    columns) carries column 0's bit i, bit 2i+1 column 1's bit i, etc.
    Pure codegen: a sum of shift/mask terms, no UDF.
    """
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_index takes 1-4 columns")
    if bits * n > 62:
        raise ValueError("bits * n_cols must stay under 62 (signed long)")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cc = c.cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * n + j
            )
    return out


def zorder_repartition(
    df: DataFrame,
    cols: list[Column],
    num_partitions: int,
    bits: int = 16,
    z_col: str = "__zorder__",
) -> DataFrame:
    """Range-partition (and sort within partitions) by the z-order index —
    the write-side layout op: files written from this frame carry tight
    min-max zones in every interleaved dimension. The z column is kept so
    callers can drop or persist it; range partitioning samples the z
    distribution, so skewed dimensions still split evenly."""
    with_z = df.withColumn(z_col, zorder_index(cols, bits))
    return with_z.repartitionByRange(num_partitions, F.col(z_col)).sortWithinPartitions(
        F.col(z_col)
    )
