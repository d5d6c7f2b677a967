"""DFL (DiNardo-Fortin-Lemieux) reweighting (SURVEY M14).

Reference: /root/reference/oaxaca_blinder/src/dfl.rs:34-195.

Spark plan: logit of group membership (M2, iterated aggregations) -> the
reweighting factor psi(x) as a pure column expression -> three weighted KDE
aggregations on a 100-point grid (A9). Data never leaves the executors; the
driver sees 3 x 100 densities + a handful of scalars.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import InvalidGroupVariable
from ..functions.mathx import clamp
from .glm import logit
from .kde import kde_on_grid, silverman_bandwidth

__all__ = ["DflResult", "run_dfl"]

INTERCEPT = "__ob_intercept__"


@dataclass
class DflResult:
    """dfl.rs:10-19."""

    grid: list[float]
    density_a: list[float]
    density_b: list[float]
    density_b_counterfactual: list[float]


def run_dfl(
    df: DataFrame,
    outcome: str,
    group: str,
    reference_group: str,
    predictors: list[str],
    grid_size: int = 100,
) -> DflResult:
    """Counterfactual density of group B under group A's characteristics.

    Mirrors dfl.rs exactly: auto-dummies (skip-first) for string predictors
    (dfl.rs:80-103), logit(A=1) with 100 iters / tol 1e-6, psi =
    clamp(p, 1e-4, 1-1e-4)/(1-p) * (n_B/n_A), grid = 100 left-closed points
    over [min, max), Silverman bandwidths per group (kde.rs floor-index IQR),
    B's bandwidth for the counterfactual.
    """
    # group split convention shared with the builder (dfl.rs:44-56)
    uniques = [r[0] for r in df.select(group).distinct().orderBy(group).collect() if r[0] is not None]
    if len(uniques) < 2:
        raise InvalidGroupVariable("Not enough groups for comparison")
    group_b = reference_group
    group_a = uniques[0] if uniques[0] != group_b else uniques[1]

    # design: intercept + numeric predictors + skip-first dummies for strings
    dtypes = dict(df.dtypes)
    design = df.withColumn(INTERCEPT, F.lit(1.0))
    xcols = [INTERCEPT]
    for pred in predictors:
        if dtypes.get(pred) == "string":
            levels = [r[0] for r in df.select(pred).distinct().orderBy(pred).collect() if r[0] is not None]
            for lv in levels[1:]:
                name = f"{pred}_{lv}"
                design = design.withColumn(name, (F.col(pred) == F.lit(lv)).cast("double"))
                xcols.append(name)
        else:
            design = design.withColumn(pred, F.col(pred).cast("double"))
            xcols.append(pred)

    design = design.withColumn("__dfl_y", (F.col(group) == F.lit(group_a)).cast("double"))
    design = design.cache()
    try:
        fit = logit(design, xcols, "__dfl_y", max_iter=100, tol=1e-6)

        # dfl.rs:118-138: n_a / n_b counted by EXACT group value (even though
        # the logit's 0-class and the reweighted sample are "everything not A")
        crow = design.agg(
            F.sum((F.col(group) == F.lit(group_a)).cast("double")).alias("na"),
            F.sum((F.col(group) == F.lit(group_b)).cast("double")).alias("nb"),
        ).collect()[0]
        n_a, n_b = float(crow["na"]), float(crow["nb"])
        ratio_marginal = n_b / n_a  # (n_B/n)/(n_A/n) (dfl.rs:135-138)

        p = fit.prob_expr(xcols, "logit")
        p_clamped = clamp(p, 0.0001, 0.9999)
        psi = (p_clamped / (F.lit(1.0) - p_clamped)) * F.lit(ratio_marginal)

        frame_b = design.filter(F.col("__dfl_y") == 0.0).withColumn("__dfl_w", psi)
        frame_a = design.filter(F.col("__dfl_y") == 1.0)

        # grid over [min, max) with 100 left-closed points (dfl.rs:163-172)
        mm = design.agg(F.min(outcome).alias("lo"), F.max(outcome).alias("hi")).collect()[0]
        lo, hi = float(mm["lo"]), float(mm["hi"])
        step = (hi - lo) / grid_size
        grid = [lo + i * step for i in range(grid_size)]

        bw_a = silverman_bandwidth(frame_a, outcome)
        bw_b = silverman_bandwidth(frame_b, outcome)

        density_a = kde_on_grid(frame_a, outcome, grid, bw_a)
        density_b = kde_on_grid(frame_b, outcome, grid, bw_b)
        density_cf = kde_on_grid(frame_b, outcome, grid, bw_b, wcol="__dfl_w")
        return DflResult(
            grid=grid,
            density_a=density_a,
            density_b=density_b,
            density_b_counterfactual=density_cf,
        )
    finally:
        design.unpersist()
