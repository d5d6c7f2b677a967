"""Distributed budget allocation (SURVEY M18/O2/O3).

The reference's greedy loop (types.rs:98-156) is sequential: sort candidates
by most-negative residual, give each min(-residual, remaining budget). The
prefix-sum reformulation vectorizes it exactly:

  cum_prev = sum(-residual) over all strictly-preceding candidates
  adjustment = clip(min(-residual, budget - cum_prev), 0, .)

which is an ordered cumulative sum — expressed via scan.ordered_prev_cumsum
(range partition + per-partition offsets), so the prefix sum never collapses
to a single partition. Identical output to the sequential greedy including
the 1e-9 minimum-raise filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scan import ordered_prev_cumsum

__all__ = ["allocate_budget"]


def allocate_budget(
    df: DataFrame,
    residual_col: str,
    budget: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Greedy cheapest-fix allocation over rows with negative residuals.

    ``order_cols`` break ties deterministically after the residual sort
    (the reference relies on stable input order; Spark needs explicit keys).
    Returns the input columns + ``adjustment`` for rows receiving > 1e-9.
    """
    order = [F.col(residual_col).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    candidates = df.filter(F.col(residual_col) < 0)
    need = -F.col(residual_col)
    candidates = ordered_prev_cumsum(candidates, order, need, "__cum_prev")
    remaining = F.greatest(F.lit(float(budget)) - F.col("__cum_prev"), F.lit(0.0))
    adjustment = F.least(need, remaining)
    return (
        candidates.withColumn("adjustment", adjustment)
        .drop("__cum_prev")
        .filter(F.col("adjustment") > 1e-9)
    )
