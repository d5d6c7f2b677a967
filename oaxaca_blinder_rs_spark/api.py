"""High-level convenience facade mirroring the reference's Python bindings
(python.rs:193-567): OaxacaBlinder.fit/fit_quantile/optimize_budget,
run_dfl_from_csv, estimate_akm, match_units."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .builder import OaxacaBuilder
from .quantile_builder import QuantileDecompositionBuilder
from .results import OaxacaResults

__all__ = ["OaxacaBlinder", "run_dfl_from_csv", "estimate_akm", "match_units"]


class OaxacaBlinder:
    """python.rs:193-310: thin convenience wrapper over the builder."""

    def __init__(
        self,
        df: DataFrame,
        outcome: str,
        group: str,
        reference_group: str,
        predictors: list[str] | None = None,
        categorical_predictors: list[str] | None = None,
        weights: str | None = None,
        bootstrap_reps: int = 100,
        reference_coefficients: str = "group_b",
    ):
        self._df = df
        self._outcome = outcome
        self._group = group
        self._reference = reference_group
        self._predictors = list(predictors or [])
        self._categorical = list(categorical_predictors or [])
        self._weights = weights
        self._reps = bootstrap_reps
        self._ref_coeffs = reference_coefficients

    def _builder(self) -> OaxacaBuilder:
        b = OaxacaBuilder(self._df, self._outcome, self._group, self._reference)
        b.predictors(self._predictors).categorical_predictors(self._categorical)
        b.bootstrap_reps(self._reps).reference_coefficients(self._ref_coeffs)
        if self._weights:
            b.weights(self._weights)
        return b

    def fit(self) -> OaxacaResults:
        return self._builder().run()

    def fit_quantile(self, quantile: float = 0.5) -> OaxacaResults:
        """RIF-regression decomposition at a single quantile."""
        return self._builder().decompose_quantile(quantile)

    def fit_machado_mata(self, quantiles=None, simulations: int = 200):
        b = QuantileDecompositionBuilder(self._df, self._outcome, self._group, self._reference)
        b.predictors(self._predictors).categorical_predictors(self._categorical)
        b.simulations(simulations).bootstrap_reps(self._reps)
        if quantiles:
            b.quantiles(quantiles)
        return b.run()

    def optimize_budget(self, budget: float, target_gap: float = 0.0):
        return self.fit().optimize_budget(budget, target_gap)


def run_dfl_from_csv(spark: SparkSession, path: str, outcome: str, group: str,
                     reference_group: str, predictors: list[str]):
    """python.rs run_dfl_from_csv (CSV scan -> DFL)."""
    from .operators.dfl import run_dfl
    from .sources.csv import read_csv

    df = read_csv(spark, path)
    return run_dfl(df, outcome, group, reference_group, predictors)


def estimate_akm(df: DataFrame, outcome: str, worker_col: str, firm_col: str,
                 controls: list[str] | None = None):
    """python.rs estimate_akm."""
    from .operators.akm import AkmBuilder

    b = AkmBuilder(df, outcome, worker_col, firm_col)
    if controls:
        b.controls(controls)
    return b.run()


def match_units(df: DataFrame, treatment: str, outcome: str, covariates: list[str],
                k: int = 1, method: str = "euclidean", id_col: str | None = None):
    """python.rs match_units: returns the weights DataFrame (row_id, weight)."""
    from .operators.matching import MatchingEngine

    eng = MatchingEngine(df, treatment, outcome, covariates, id_col=id_col)
    if method == "psm":
        return eng.match_psm(k)
    return eng.run_matching(k, method == "mahalanobis")
