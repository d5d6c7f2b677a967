"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split handles most skew at runtime (enabled in this repo's
sessions), but it only splits the SHUFFLE side of a sort-merge join and
needs statistics to trigger. When one join key holds a double-digit share
of a 100 TB fact table (the classic null-bucket / default-value / megacity
key), explicit salting is the deterministic fix: spread the big side's hot
rows across ``salt`` sub-keys and replicate the matching small-side rows to
every sub-key, so no single reducer owns the hot key.

Semantics are identical to the unsalted equi-join (inner/left): each big
row keeps exactly one salt value, and the small side carries every salt
value, so each matched pair appears exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "skew_report"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on``, salting the key ``salt``
    ways.

    The big side gets a deterministic per-row salt (hash of the whole row,
    mod salt) — uniform even when the join key itself is constant; the
    small side is exploded salt times (its size multiplies by ``salt``:
    keep it the dimension side). Join keys become (on..., salt), so a key
    holding p% of the table spreads over ``salt`` reducers instead of one.

    how: 'inner' or 'left' (the outer side must be ``big`` — replicating
    the small side makes right/full outer semantics ambiguous).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn("__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(int(salt))))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(int(salt))]))
    )
    return big_s.join(small_s, keys + ["__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Key-skew diagnosis before a join/groupBy: the top-k hottest keys
    with their row counts, share of the table, and cumulative share —
    the numbers that decide whether a key needs salting (salted_join) or
    AQE skew handling. One count aggregate, then a DISTRIBUTED top-k cut
    (orderBy + limit = TakeOrdered with per-partition heaps — never a
    global window over the full key-count table, which at 100 TB can
    itself be huge); only the k surviving rows see a window for the
    rank/cum-share bookkeeping. Deterministic (count desc, key asc)
    ranking. Returns (rank, key, n, share, cum_share), 6-dp rounded.
    """
    from pyspark.sql import Window

    total = df.count()
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(int(top_k))
    # both windows below run AFTER limit(top_k) — <= top_k rows, one tiny
    # task; Spark's "WindowExec: No Partition Defined" warning here is
    # cosmetic, not a scale hazard (see scan.py for the general rule)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    ranked = top.withColumn("rank", F.row_number().over(w)).withColumn(
        "share", F.round(F.col("n") / F.lit(float(total)), 6)
    )
    w2 = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ranked.withColumn(
        "cum_share", F.round(F.sum(F.col("n") / F.lit(float(total))).over(w2), 6)
    ).select("rank", "key", "n", "share", "cum_share")
