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
        # r14 OPT: compress_cells — the group logit's per-iteration Gram is a
        # sum over distinct (x, y) cells times counts; small-support designs
        # (categoricals + low-cardinality numerics) fit on the driver with
        # zero per-iteration Spark jobs, large supports fall back unchanged
        # (GLM_CELL_COLLECT_LIMIT guard in glm.fit_many)
        fit = logit(design, xcols, "__dfl_y", max_iter=100, tol=1e-6, compress_cells=True)

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

        # grid over [min, max) with 100 left-closed points (dfl.rs:163-172);
        # the group counts/variances ride the same driver round-trip shape
        mm = design.agg(F.min(outcome).alias("lo"), F.max(outcome).alias("hi")).collect()[0]
        lo, hi = float(mm["lo"]), float(mm["hi"])
        step = (hi - lo) / grid_size
        grid = [lo + i * step for i in range(grid_size)]

        # r14 OPT (guide §1.2): ONE grouped moment aggregate + ONE grouped
        # order_stats pass replace two per-frame Silverman scans, and ONE
        # conditional-sum KDE pass over the shared grid explode replaces
        # three kde_on_grid scans (each exploded |rows| x |grid| rows).
        # Same quantities: the group split is exactly the frame filters,
        # order statistics are exact, and excluded rows add exact +0.0 to
        # each conditional sum. Oracle re-verified at 3 SFs.
        from .kde import kde_on_grid_many, order_stats

        vrows = design.groupBy("__dfl_y").agg(
            F.count(outcome).alias("n"), F.variance(outcome).alias("var")
        ).collect()
        moments = {
            float(r["__dfl_y"]): (int(r["n"]), float(r["var"]))
            for r in vrows
            if r["__dfl_y"] is not None
        }
        import math as _math

        idxs = sorted(
            {i for n, _ in moments.values() for i in (int(n * 0.25), int(n * 0.75))}
        )
        os_ = order_stats(design, outcome, idxs, group="__dfl_y")

        def _bw(gval: float) -> float:
            n, var = moments[gval]
            sd = _math.sqrt(var)
            iqr = os_[(gval, int(n * 0.75))] - os_[(gval, int(n * 0.25))]
            a = min(sd, iqr / 1.34)
            return 0.9 * a * n ** (-0.2)

        bw_a = _bw(1.0)
        bw_b = _bw(0.0)

        is_a = F.col("__dfl_y") == 1.0
        is_b = F.col("__dfl_y") == 0.0
        dens = kde_on_grid_many(
            design,
            outcome,
            grid,
            [
                ("a", is_a, None, bw_a),
                ("b", is_b, None, bw_b),
                ("cf", is_b, psi, bw_b),
            ],
        )
        density_a = dens["a"]
        density_b = dens["b"]
        density_cf = dens["cf"]
        return DflResult(
            grid=grid,
            density_a=density_a,
            density_b=density_b,
            density_b_counterfactual=density_cf,
        )
    finally:
        design.unpersist()
