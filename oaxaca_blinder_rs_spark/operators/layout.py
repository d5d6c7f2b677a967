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

__all__ = ["zorder_index", "zorder_repartition", "hilbert_index", "hilbert_repartition"]


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


def hilbert_index(xcol: Column, ycol: Column, bits: int = 16) -> Column:
    """Hilbert-curve index of two pre-quantized integer columns — the
    locality-superior sibling of ``zorder_index`` (Morton): the Hilbert
    walk takes only unit steps, so consecutive index values are ALWAYS
    grid neighbours and min-max zones prune strictly better than Morton's
    quadrant jumps (the layout Databricks liquid clustering moved to).

    Inputs must already be integers in [0, 2^bits) — quantize upstream,
    the zorder_index convention. The classic iterative xy2d walk (per-level
    quadrant digit + rotate/flip) runs as ONE runtime fold
    (``F.aggregate`` over the level sequence, the BPE-fold pattern): the
    lambda is a single small expression evaluated bits times per row, so
    the plan stays flat — no per-level expression nesting, no UDF, pure
    codegen integer arithmetic the DuckDB oracle replays stage-by-stage.
    """
    if bits < 1 or 2 * bits > 62:
        raise ValueError("bits must be in [1, 31]")
    n = 1 << bits

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        d2 = acc["d"] + s * s * ((rx * 3).bitwiseXOR(ry))
        # rot: ry==0 -> (optional n-1-flip when rx==1) then swap x/y
        fx = F.when(rx == 1, F.lit(n - 1) - acc["x"]).otherwise(acc["x"])
        fy = F.when(rx == 1, F.lit(n - 1) - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, fy).otherwise(acc["x"])
        ny = F.when(ry == 0, fx).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    init = F.struct(
        xcol.cast("long").alias("x"),
        ycol.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    # the level sequence as s = 2^l literals, MSB first (shiftleft's Python
    # wrapper only takes int literals, so fold directly over the s values)
    levels = F.array(*[F.lit(1 << l).cast("long") for l in range(bits - 1, -1, -1)])
    return F.aggregate(levels, init, step).getField("d")


def hilbert_repartition(
    df: DataFrame,
    xcol: Column,
    ycol: Column,
    num_partitions: int,
    bits: int = 16,
    h_col: str = "__hilbert__",
) -> DataFrame:
    """Range-partition + sort by the Hilbert index — the write-side layout
    op, mirroring ``zorder_repartition``."""
    with_h = df.withColumn(h_col, hilbert_index(xcol, ycol, bits))
    return with_h.repartitionByRange(num_partitions, F.col(h_col)).sortWithinPartitions(
        F.col(h_col)
    )
