"""Distributed as-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with right.time <=
left.time (per key): the state-at-event-time join every event pipeline and
feature store needs (latest model score before a click, last account state
before a transaction).

Spark-first formulation (no Python in the loop): UNION the two sides with a
source tag, then ONE window pass per key ordered by (time, tag, tiebreak)
taking last(payload, ignorenulls=True) over the preceding frame — right rows
sort before left rows at equal timestamps, giving the inclusive (<=)
semantics DuckDB's ASOF JOIN implements (the contract oracle). The window
partitions on the join key: with feature-store key cardinality (users,
devices, accounts) the work spreads uniformly; a single global as-of (no
key) funnels one task and is rejected.

Why not merge_asof in applyInPandas: same shuffle, but every group's rows
must materialize in one pandas frame; the window form streams through the
sort and keeps whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _orderable(dt) -> bool:
    """Whether Spark can ORDER BY this type (maps can't; arrays/structs can
    iff their element/field types can)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix``-named columns holding
    the latest right payload at-or-before its ``time_col`` (per ``by`` key) —
    or, with ``direction='forward'``, the EARLIEST right payload at-or-after
    it (the next-state join: first fill after an order, next heartbeat
    after an alert).

    right_cols: payload columns to carry (default: all non-key, non-time
    right columns). tolerance_seconds: matches further away than this are
    nulled (the match must be recent/near enough to be meaningful).
    allow_exact_matches=False makes the comparison strict (< / >) — a
    same-timestamp right row no longer matches, pandas-merge_asof style.
    Also emits ``{prefix}{time_col}`` — the matched right timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    if time_col in keys:
        raise ValueError("time_col cannot be a by key")
    payload = right_cols or [c for c in right.columns if c not in keys + [time_col]]
    missing = [c for c in payload if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right: {missing}")

    # tag order at equal time: right (0) before left (1) -> inclusive <=
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast("timestamp").alias("__r_time"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(time_col),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(time_col).cast("timestamp").alias("__r_time"),
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
            if c not in keys + [time_col]
        ],
    ).select(l_tag.columns)  # align column order for union

    # backward: frame = everything up to and incl. the current row, take the
    # LAST right payload; forward: mirror it — right rows sort AFTER left at
    # equal ts is wrong for inclusive >=, so keep right-first ordering and
    # use the following frame with FIRST. At equal ts, right(0) < left(1) in
    # the sort, so a following frame anchored at the left row excludes a
    # same-ts right row — order __src DESC for forward instead (left before
    # right at equal ts -> the frame [current, following] includes it).
    # equal-timestamp tag order decides inclusivity: the right row matches
    # iff it falls inside the left row's frame. backward+inclusive and
    # forward+strict want right rows FIRST at equal ts; the other two last.
    src = F.col("__src").asc() if (direction == "backward") == allow_exact_matches else F.col("__src").desc()
    # Duplicate right rows at the same (key, time) would make the picked
    # payload depend on shuffle order; the payload columns themselves are the
    # final tie-break so the pick is deterministic run-to-run (backward takes
    # the greatest payload tuple, forward the least). If right is unique on
    # (by, time_col) — the normal feature-store contract — this never fires.
    # Only ORDERABLE payload types join the tie-break: a map-typed payload
    # in an ORDER BY is an AnalysisException at plan time, and its presence
    # must not break the join for right sides that are unique anyway.
    rdtypes = {f.name: f.dataType for f in right.schema.fields}
    tiebreak = [c for c in payload if _orderable(rdtypes[c])]
    order = [F.col(time_col).asc(), src, F.col("__r_time").asc()] + [
        F.col(f"__r_{c}").asc_nulls_first() for c in tiebreak
    ]
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            pick(F.col(f"__r_{c}")).over(w).alias(f"__m_{c}")
            for c in payload
        ],
        pick(F.col("__r_time")).over(w).alias("__m_time"),
    )
    out = carried.filter(F.col("__src") == 1)
    t_sec = F.col(time_col).cast("timestamp").cast("double")  # NTZ-safe hop
    m_sec = F.col("__m_time").cast("double")
    gap = t_sec - m_sec if direction == "backward" else m_sec - t_sec
    within = (
        F.lit(True) if tolerance_seconds is None else (gap <= float(tolerance_seconds))
    )
    sel = [F.col(c) for c in left.columns]
    for c in payload:
        sel.append(F.when(within, F.col(f"__m_{c}")).otherwise(F.lit(None)).alias(f"{prefix}{c}"))
    sel.append(
        F.when(within, F.col("__m_time")).otherwise(F.lit(None)).alias(f"{prefix}{time_col}")
    )
    return out.select(*sel)
