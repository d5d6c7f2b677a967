"""Change-data-capture operators: slowly-changing-dimension (SCD Type 2)
interval builds and incremental merges.

The warehouse staple the reference's batch surface stops short of (its
engine mutates rows in place, engine_ops point-mutation semantics;
`engine/src/ops.rs` analogue): given an append-only change feed
(key, ts, attributes...), produce the effective-dated dimension — one row
per run of constant attributes with [valid_from, valid_to) validity and an
is_current flag — and keep it up to date incrementally as new changes
arrive.

Scale shape: everything is keyed by the dimension key. ``scd2_build`` is
two window passes over ONE hash partitioning of the key (the change-point
filter preserves distribution and order, so Catalyst plans a single
Exchange — plan-asserted); skew is bounded by the per-key change count,
not table size. ``scd2_apply`` touches ONLY keys present in the incoming
batch: untouched dimension rows pass through a left-anti join unmodified,
so an incremental trickle never rewrites the whole dimension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "scd2_apply"]


def _validate(df: DataFrame, cols: Sequence[str]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")


def scd2_build(
    changes: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an append-only change feed into SCD Type-2 intervals.

    Consecutive rows (per key, ordered by ``ts_col`` then ``order_cols`` —
    pass a unique column such as an event id to pin same-timestamp order)
    with identical ``attr_cols`` merge into one interval; each attribute
    change opens a new one. Returns one row per interval:
    (key, attrs..., order_cols..., valid_from, valid_to, is_current) with
    valid_to = next interval's valid_from (NULL on the open, current row).
    The opening row's ``order_cols`` are carried through so a dimension can
    be replayed as a change feed with its original same-timestamp order
    intact (what makes ``scd2_apply`` lossless). Null attribute values
    compare null-safely: null -> null is NOT a change.
    """
    attr_cols = list(attr_cols)
    order_cols = list(order_cols)
    _validate(changes, [key_col, ts_col, *attr_cols, *order_cols])
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    is_first = F.row_number().over(w) == 1
    changed = is_first
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    seg = changes.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    nxt = F.lead(ts_col).over(w2)
    return seg.select(
        key_col,
        *attr_cols,
        *order_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Incrementally merge a new change batch into an existing SCD2
    dimension (the MERGE/upsert of a warehouse load).

    Only keys present in ``changes`` are rebuilt: their existing intervals
    are replayed as a change feed (valid_from becomes the change ts and the
    carried order_cols restore the original same-timestamp order — the
    interval starts are exactly the original change points, so the replay
    is lossless) unioned with the new batch, then re-collapsed by
    ``scd2_build``; a late-arriving change that lands INSIDE an existing
    interval splits it, and a no-op change (same attrs as the covering
    interval) collapses away — apply-then-build equals build-on-everything
    (property-tested). Untouched keys stream through a broadcast-able
    left-anti join without reshuffling their interval rows.
    """
    attr_cols = list(attr_cols)
    order_cols = list(order_cols)
    _validate(dim, [key_col, *attr_cols, *order_cols, "valid_from"])
    keys = changes.select(key_col).distinct()
    untouched = dim.join(keys, key_col, "left_anti")
    feed_cols = [key_col, *attr_cols, ts_col, *order_cols]
    replay = (
        dim.join(keys, key_col, "left_semi")
        .withColumnRenamed("valid_from", ts_col)
        .select(*feed_cols)
    )
    merged = replay.unionByName(changes.select(*feed_cols))
    rebuilt = scd2_build(merged, key_col, attr_cols, ts_col, order_cols)
    return untouched.select(rebuilt.columns).unionByName(rebuilt)
