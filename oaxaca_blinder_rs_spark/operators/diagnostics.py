"""VIF multicollinearity diagnostics (SURVEY M17).

Reference: /root/reference/oaxaca_blinder/src/math/diagnostics.rs:29-109.

Spark plan: ONE aggregation computes the full (k+1)x(k+1) Gram matrix of
[intercept, predictors] — every auxiliary regression "p ~ others" is then a
driver-side submatrix solve of that single Gram. The reference runs k full
OLS passes over the data; we run one pass total, any n.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import OaxacaError
from ..functions.linalg import collect_group_stats

INTERCEPT = "__ob_intercept__"


@dataclass
class VifResult:
    variable_name: str
    vif_score: float


def calculate_vif(df: DataFrame, predictor_names: list[str], engine: str = "expr") -> list[VifResult]:
    """VIF_p = 1/(1-R^2) of p regressed on the other predictors + intercept.

    Singular auxiliary fit or zero variance or R^2 -> 1 gives infinity
    (diagnostics.rs:70-106). Null predictor values count as 0.0
    (diagnostics.rs:46: unwrap_or(0.0)).
    """
    if len(predictor_names) < 2:
        raise OaxacaError("VIF calculation requires at least two predictors.")

    base = df.select(
        *[F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c) for c in predictor_names]
    ).withColumn(INTERCEPT, F.lit(1.0))
    cols = [INTERCEPT] + list(predictor_names)
    stats = collect_group_stats(base, cols, None, engine="expr")
    G = stats.xtx  # (k+1)x(k+1) Gram incl. intercept cross-sums
    n = stats.n

    results: list[VifResult] = []
    for p in predictor_names:
        pi = cols.index(p)
        others = [i for i in range(len(cols)) if i != pi]
        A = G[np.ix_(others, others)]
        b = G[others, pi]
        yty = G[pi, pi]
        ysum = G[0, pi]  # intercept row = plain sums
        try:
            L = np.linalg.cholesky(A)
            beta = np.linalg.solve(L.T, np.linalg.solve(L, b))
        except np.linalg.LinAlgError:
            results.append(VifResult(p, math.inf))
            continue
        ss_residual = float(yty - 2 * beta @ b + beta @ A @ beta)
        ss_total = float(yty - ysum * ysum / n)
        if ss_total == 0.0:
            results.append(VifResult(p, math.inf))
            continue
        r_squared = 1.0 - ss_residual / ss_total
        if abs(1.0 - r_squared) < 1e-9:
            results.append(VifResult(p, math.inf))
        else:
            results.append(VifResult(p, 1.0 / (1.0 - r_squared)))
    return results
