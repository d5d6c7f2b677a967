"""Quantile regression kernel (SURVEY M4).

Reference: /root/reference/oaxaca_blinder/src/math/quantile_regression.rs
formulates the check-loss minimization as an LP (min tau*1'u + (1-tau)*1'v
s.t. X beta + u - v = y) solved by the Clarabel interior-point solver.

This container has no LP solver (no scipy), so we solve the SAME objective by
iteratively reweighted least squares (the MM algorithm statsmodels' QuantReg
uses): WLS with weights w_i = 1/max(|r_i|, eps) scaled tau / (1-tau) by
residual sign majorizes the check loss and converges to the LP optimum for
well-posed problems. The reference's own accuracy bar (beta within 1e-4 on
its test fixtures, quantile_regression.rs:131-171) is met; ties/degenerate
vertices may differ from the LP at ~eps scale.
"""

from __future__ import annotations

import numpy as np

__all__ = ["solve_qr", "exact_n_counts"]

# Worker-side memo for deterministic resample multiplicities: Spark reuses
# Python workers across mapInPandas passes (spark.python.worker.reuse), so the
# Gram-Newton engine's per-iteration passes hit this cache instead of redrawing
# n integers per (replicate, side) every iteration. int32 counts keep the
# cache at ~4 MB per million rows per key; the size cap bounds worker memory.
_COUNTS_CACHE: dict[tuple, np.ndarray] = {}
_COUNTS_CACHE_MAX = 256


def exact_n_counts(seed: int, rep: int, side: int, n: int) -> np.ndarray:
    """Multiplicity vector of the deterministic exact-n bootstrap resample.

    Same stream as the Machado-Mata tau-batch engine's in-task resample
    (``default_rng([seed, 11, rep, side]).integers(0, n, n)``) — a weighted
    fit with these multiplicities is the identical estimator to fitting the
    materialized resample, so both engines share one bootstrap definition and
    the driver's simulation-pick translation.
    """
    key = (int(seed), int(rep), int(side), int(n))
    c = _COUNTS_CACHE.get(key)
    if c is None:
        idx = np.random.default_rng([key[0], 11, key[1], key[2]]).integers(0, n, size=n)
        c = np.bincount(idx, minlength=n).astype(np.int32)
        if len(_COUNTS_CACHE) >= _COUNTS_CACHE_MAX:
            _COUNTS_CACHE.clear()
        _COUNTS_CACHE[key] = c
    return c


def solve_qr(
    X: np.ndarray,
    y: np.ndarray,
    tau: float,
    max_iter: int = 200,
    tol: float = 1e-8,
    eps: float = 1e-9,
) -> np.ndarray:
    """Minimize sum rho_tau(y - X beta). Raises on failure like solve_qr."""
    n, k = X.shape
    if len(y) != n:
        raise ValueError("Input dimensions mismatch: X and y must have the same number of observations.")
    if not 0.0 <= tau <= 1.0:
        raise ValueError("Tau must be between 0 and 1.")
    # start from OLS
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    for _ in range(max_iter):
        r = y - X @ beta
        absr = np.maximum(np.abs(r), eps)
        w = np.where(r > 0, tau, 1.0 - tau) / absr
        XtW = X.T * w
        A = XtW @ X
        b = XtW @ y
        try:
            beta_new = np.linalg.solve(A + 1e-12 * np.eye(k), b)
        except np.linalg.LinAlgError as e:
            raise RuntimeError("QR IRLS solve failed (singular design)") from e
        if np.max(np.abs(beta_new - beta)) < tol:
            beta = beta_new
            break
        beta = beta_new
    if not np.all(np.isfinite(beta)):
        raise RuntimeError("QR IRLS diverged")
    return beta
