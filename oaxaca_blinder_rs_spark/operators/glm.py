"""GLM kernels: logit (M2) and probit (M3) as iterated Gram aggregations.

Reference: /root/reference/oaxaca_blinder/src/math/logit.rs:31-118 (Newton-
Raphson, clamp [1e-10, 1-1e-10], ||step|| < tol), math/probit.rs:25-172
(Fisher scoring, -1e-9 diagonal regularization, Cholesky with LU fallback),
matching/logistic.rs (same logit but ridge 1e-6 on the Hessian).

Spark-first design — **multi-model IRLS**: `fit_many` fits one GLM per
distinct key (e.g. per group, or per (bootstrap_rep, group)) simultaneously.
Each Newton iteration is ONE distributed aggregation:

    per-row weight/score expressions (from each model's current beta)
      -> groupBy(keys).agg(X'WX upper triangle, X'score)   [one shuffle]
      -> driver updates every model's k-vector, tracks convergence

Current betas reach the executors either as CASE literals (few models) or a
broadcast-joined beta table (many models — the bootstrap path), so 500
bootstrap probits cost the same number of Spark jobs as one probit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ConvergenceError, SingularMatrix
from ..functions.mathx import clamp, norm_cdf, norm_pdf, sigmoid

__all__ = ["GlmFit", "logit", "probit", "fit_many", "xb_expr"]

_CASE_LITERAL_LIMIT = 8


@dataclass
class GlmFit:
    """Mirror of LogitResult / ProbitResult."""

    names: list[str]
    beta: np.ndarray
    converged: bool
    iterations: int
    vcov: np.ndarray | None = field(default=None, repr=False)

    def prob_expr(self, xcols: list[str], family: str = "logit") -> Column:
        """Predicted probability as a Catalyst expression (for huge frames)."""
        xb = xb_expr(self.beta, xcols)
        if family == "logit":
            return clamp(sigmoid(xb), 1e-10, 1.0 - 1e-10)
        return clamp(norm_cdf(xb), 1e-10, 1.0 - 1e-10)


def xb_expr(beta, xcols: list[str]) -> Column:
    e = F.lit(0.0)
    for b, c in zip(beta, xcols):
        e = e + F.col(c) * F.lit(float(b))
    return e


# Per-row IRLS (weight, score) per family, staged inside fit_many:
#   logit:  w = p(1-p),                 score = y - p         (logit.rs:46-66)
#   probit: w = phi^2/(Phi(1-Phi)),     score = lambda        (probit.rs:60-81)
#           lambda = phi/Phi if y=1 else -phi/(1-Phi)


def _beta_column(df: DataFrame, betas: dict, key_cols: list[str], k: int) -> tuple[DataFrame, Column]:
    """Materialize each row's current beta as an array column."""
    spark = df.sparkSession
    if len(betas) <= _CASE_LITERAL_LIMIT:
        expr = None
        for key, beta in betas.items():
            cond = None
            for c, v in zip(key_cols, key):
                this = F.col(c) == F.lit(v)
                cond = this if cond is None else (cond & this)
            arr = F.array(*[F.lit(float(b)) for b in beta])
            expr = F.when(cond, arr) if expr is None else expr.when(cond, arr)
        return df, expr
    rows = [tuple(list(key) + [[float(b) for b in beta]]) for key, beta in betas.items()]
    schema_parts = []
    for c in key_cols:
        dtype = dict(df.dtypes).get(c, "string")
        schema_parts.append(f"{c} {dtype}")
    schema_parts.append("__beta array<double>")
    beta_df = spark.createDataFrame(rows, ", ".join(schema_parts))
    joined = df.join(F.broadcast(beta_df), on=key_cols, how="inner")
    return joined, F.col("__beta")


def fit_many(
    df: DataFrame,
    xcols: list[str],
    ycol: str,
    family: str = "logit",
    key_cols: list[str] | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
    ridge: float = 0.0,
    diag_reg: float | None = None,
    wcol: str | None = None,
) -> dict[tuple, GlmFit]:
    """Fit one GLM per distinct key in one aggregation per iteration.

    ``wcol`` multiplies both the information matrix and the score — it carries
    frequency weights (e.g. Poisson-bootstrap counts).
    Returns {key_tuple: GlmFit}. Keyless fit => {(): GlmFit}.
    """
    key_cols = key_cols or []
    k = len(xcols)
    if diag_reg is None:
        diag_reg = 1e-9 if family == "probit" else 0.0

    # discover keys + initialize beta = 0 (logit.rs:41, probit.rs:40)
    if key_cols:
        keys = [tuple(r) for r in df.select(*key_cols).distinct().collect()]
    else:
        keys = [()]
    betas = {key: np.zeros(k) for key in keys}
    done: dict[tuple, GlmFit] = {}
    infos: dict[tuple, np.ndarray] = {}

    freq = F.col(wcol) if wcol else F.lit(1.0)
    tri = [(i, j) for i in range(k) for j in range(i, k)]

    it = 0
    while it < max_iter and len(done) < len(keys):
        it += 1
        active = {key: b for key, b in betas.items() if key not in done}
        work = df
        if key_cols and len(done) > 0 and len(active) < len(keys):
            # stop scanning rows whose models already converged
            conds = None
            for key in active:
                cond = None
                for c, v in zip(key_cols, key):
                    this = F.col(c) == F.lit(v)
                    cond = this if cond is None else (cond & this)
                conds = cond if conds is None else (conds | cond)
            work = df.filter(conds)

        if key_cols:
            work, beta_col = _beta_column(work, active, key_cols, k)
            xb = F.lit(0.0)
            for j, c in enumerate(xcols):
                xb = xb + F.col(c) * F.element_at(beta_col, j + 1)
        else:
            xb = xb_expr(betas[()], xcols)

        # stage the link-function pipeline as chained narrow projections
        # (xb -> phi/Phi -> w/score). Catalyst fuses them into one codegen
        # stage, but keeping each erf/sigmoid tree a single occurrence over a
        # leaf column keeps the analyzed plan small — inlining xb into the
        # 4 probit sub-expressions made driver-side analysis the bottleneck.
        work = work.select(
            *key_cols, *xcols,
            F.col(ycol).alias("__y"), freq.alias("__fq"), xb.alias("__xb"),
        )
        if family == "probit":
            work = work.withColumn("__phi", norm_pdf(F.col("__xb"))).withColumn(
                "__bigphi", clamp(norm_cdf(F.col("__xb")), 1e-10, 1.0 - 1e-10)
            )
            phi, big_phi, y = F.col("__phi"), F.col("__bigphi"), F.col("__y")
            w_expr = (phi * phi) / (big_phi * (F.lit(1.0) - big_phi))
            score_expr = F.when(y > 0.5, phi / big_phi).otherwise(
                -phi / (F.lit(1.0) - big_phi)
            )
        elif family == "logit":
            work = work.withColumn(
                "__p", clamp(sigmoid(F.col("__xb")), 1e-10, 1.0 - 1e-10)
            )
            p = F.col("__p")
            w_expr = p * (F.lit(1.0) - p)
            score_expr = F.col("__y") - p
        else:
            raise ValueError(f"unknown family: {family}")
        work = work.select(
            *key_cols,
            *xcols,
            (F.col("__fq") * w_expr).alias("__fw"),
            (F.col("__fq") * score_expr).alias("__fs"),
        )
        aggs = []
        for (i, j) in tri:
            aggs.append(F.sum(F.col("__fw") * F.col(xcols[i]) * F.col(xcols[j])).alias(f"__h_{i}_{j}"))
        for i in range(k):
            aggs.append(F.sum(F.col(xcols[i]) * F.col("__fs")).alias(f"__g_{i}"))

        if key_cols:
            rows = work.groupBy(*key_cols).agg(*aggs).collect()
            by_key = {tuple(r[c] for c in key_cols): r for r in rows}
        else:
            by_key = {(): work.agg(*aggs).collect()[0]}

        for key, row in by_key.items():
            info = np.zeros((k, k))
            for (i, j) in tri:
                v = float(row[f"__h_{i}_{j}"] or 0.0)
                info[i, j] = info[j, i] = v
            grad = np.array([float(row[f"__g_{i}"] or 0.0) for i in range(k)])
            info += (ridge + diag_reg) * np.eye(k)
            try:
                L = np.linalg.cholesky(info)
                z = np.linalg.solve(L, grad)
                step = np.linalg.solve(L.T, z)
            except np.linalg.LinAlgError:
                if family == "probit":
                    # probit.rs:131-141 LU fallback on the (negative) Hessian
                    try:
                        step = np.linalg.solve(info, grad)
                    except np.linalg.LinAlgError as e:
                        raise SingularMatrix("Failed to solve Hessian system in Probit") from e
                else:
                    raise SingularMatrix(
                        "Failed to solve Information Matrix in Logit. Perfect separation?"
                    ) from None
            betas[key] = betas[key] + step
            infos[key] = info
            if float(np.linalg.norm(step)) < tol:
                done[key] = GlmFit(names=list(xcols), beta=betas[key], converged=True, iterations=it)

    for key in keys:
        if key not in done:
            done[key] = GlmFit(names=list(xcols), beta=betas[key], converged=False, iterations=max_iter)
        if family == "probit" and key in infos:
            # vcov = (X'WX + reg I)^{-1} (probit.rs:147-165: -H^{-1})
            try:
                done[key].vcov = np.linalg.inv(infos[key])
            except np.linalg.LinAlgError as e:
                raise SingularMatrix("Failed to invert Hessian for VCOV") from e
    return done


def logit(
    df: DataFrame,
    xcols: list[str],
    ycol: str,
    max_iter: int = 100,
    tol: float = 1e-6,
    ridge: float = 0.0,
    wcol: str | None = None,
) -> GlmFit:
    """Newton-Raphson logistic regression (math/logit.rs:31-118).

    ``ridge=1e-6`` reproduces the matching engine's variant
    (matching/logistic.rs:87-91) — the two reference logits differ only here.
    """
    return fit_many(df, xcols, ycol, family="logit", max_iter=max_iter, tol=tol, ridge=ridge, wcol=wcol)[()]


def probit(
    df: DataFrame,
    xcols: list[str],
    ycol: str,
    max_iter: int = 100,
    tol: float = 1e-6,
    wcol: str | None = None,
) -> GlmFit:
    """Fisher-scoring probit (math/probit.rs:25-172)."""
    return fit_many(df, xcols, ycol, family="probit", max_iter=max_iter, tol=tol, wcol=wcol)[()]
