"""Distributed range (interval) join — the second join shape Spark lacks.

point-in-interval: each left row with a point value joins every right row
whose [start, end] contains it (optionally per key). Naively this is an
inequality join, which Spark plans as a broadcast-nested-loop or cartesian
product — O(n*m) at any scale. The scalable formulation buckets the value
axis: a point lives in exactly one bucket, an interval is replicated to
every bucket it overlaps, and the join becomes an EQUI-join on
(key, bucket) followed by the exact containment filter. Shuffle volume is
n + m * avg_span/bucket and no nested loop ever runs.

Pick ``bucket_width`` near the typical interval span: much smaller wastes
replication, much larger degrades bucket selectivity (both only cost
constant factors — correctness never depends on the width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows containing it
    (start <= point <= end, plus equality on ``by`` keys if given).

    Numeric or timestamp axes both work (timestamps are compared on their
    epoch seconds). how: 'inner' or 'left' (left keeps pointless rows with
    null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    w = float(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    types = dict(points.dtypes) | dict(intervals.dtypes)

    def axis(col):
        c = F.col(col)
        # TIMESTAMP_NTZ has no direct double cast; hop through LTZ first
        if types.get(col, "").startswith("timestamp"):
            c = c.cast("timestamp")
        return c.cast("double")

    p = points.withColumn("__pid", F.monotonically_increasing_id()).withColumn(
        "__bucket", F.floor(axis(point_col) / w)
    )
    b_lo = F.floor(axis(start_col) / w)
    b_hi = F.floor(axis(end_col) / w)
    iv = (
        intervals.filter(axis(end_col) >= axis(start_col))
        .withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    )
    contained = (axis(start_col) <= axis(point_col)) & (
        axis(point_col) <= axis(end_col)
    )
    matched = p.join(iv, keys + ["__bucket"], "inner").filter(contained)
    if how == "inner":
        return matched.drop("__bucket", "__pid")
    # left: unmatched points come back with null interval columns
    iv_cols = [c for c in intervals.columns if c not in keys]
    unmatched = p.join(matched.select("__pid"), "__pid", "left_anti")
    for c in iv_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.drop("__bucket", "__pid").unionByName(
        unmatched.drop("__bucket", "__pid").select(matched.drop("__bucket", "__pid").columns)
    )
