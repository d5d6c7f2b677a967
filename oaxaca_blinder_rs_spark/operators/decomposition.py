"""Driver-side decomposition arithmetic (SURVEY M6-M10).

These operate on k-vectors already reduced from Spark aggregations — they are
pure NumPy mirrors of /root/reference/oaxaca_blinder/src/decomposition.rs and
math/normalization.rs. No Spark work happens here.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np


class ReferenceCoefficients(str, Enum):
    """decomposition.rs:8-24; default GroupB."""

    GROUP_A = "group_a"
    GROUP_B = "group_b"
    POOLED = "pooled"
    WEIGHTED = "weighted"
    # Aliases (Cotton == Weighted, Neumark == Pooled)
    COTTON = "weighted"
    NEUMARK = "pooled"

    @classmethod
    def parse(cls, v: "ReferenceCoefficients | str") -> "ReferenceCoefficients":
        if isinstance(v, cls):
            return v
        s = str(v).strip().lower().replace("-", "_")
        mapping = {
            "group_a": cls.GROUP_A,
            "groupa": cls.GROUP_A,
            "a": cls.GROUP_A,
            "group_b": cls.GROUP_B,
            "groupb": cls.GROUP_B,
            "b": cls.GROUP_B,
            "pooled": cls.POOLED,
            "neumark": cls.POOLED,
            "weighted": cls.WEIGHTED,
            "cotton": cls.WEIGHTED,
        }
        if s not in mapping:
            raise ValueError(f"Unknown reference coefficients: {v}")
        return mapping[s]


@dataclass
class TwoFold:
    explained: float
    unexplained: float


@dataclass
class ThreeFold:
    endowments: float
    coefficients: float
    interaction: float


def two_fold_decomposition(xa_mean, xb_mean, beta_a, beta_b, beta_star) -> TwoFold:
    """decomposition.rs:56-70: explained = (xA-xB)'b*; unexplained = total - explained."""
    explained = float((xa_mean - xb_mean) @ beta_star)
    total_gap = float(xa_mean @ beta_a - xb_mean @ beta_b)
    return TwoFold(explained=explained, unexplained=total_gap - explained)


def three_fold_decomposition(xa_mean, xb_mean, beta_a, beta_b) -> ThreeFold:
    """decomposition.rs:73-89."""
    dx = xa_mean - xb_mean
    db = beta_a - beta_b
    return ThreeFold(
        endowments=float(dx @ beta_b),
        coefficients=float(xb_mean @ db),
        interaction=float(dx @ db),
    )


def detailed_decomposition(xa_mean, xb_mean, beta_a, beta_b, beta_star, names):
    """decomposition.rs:92-122: per-variable explained/unexplained."""
    explained = {}
    unexplained = {}
    for i, name in enumerate(names):
        explained[name] = float((xa_mean[i] - xb_mean[i]) * beta_star[i])
        unexplained[name] = float(
            xa_mean[i] * (beta_a[i] - beta_star[i]) + xb_mean[i] * (beta_star[i] - beta_b[i])
        )
    return explained, unexplained


def normalize_categorical_coefficients(
    beta: np.ndarray,
    names: list[str],
    normalization_vars: list[str],
    category_counts: dict[str, int],
    intercept_name: str = "__ob_intercept__",
) -> dict[str, float]:
    """Yun (2005) normalization, mirroring math/normalization.rs:5-51.

    For each normalized categorical var with m categories (m INCLUDES the
    omitted base level): mean_b = sum(dummy betas)/m; each dummy beta -= mean_b;
    intercept += mean_b; implied base-category coefficient = -mean_b.
    Mutates ``beta`` in place; returns {var: base_coefficient}.
    """
    base_coeffs: dict[str, float] = {}
    try:
        intercept_idx = names.index(intercept_name)
    except ValueError:
        intercept_idx = None
    for var in normalization_vars:
        prefix = f"{var}_"
        idxs = [i for i, n in enumerate(names) if n.startswith(prefix)]
        if not idxs:
            continue
        m = category_counts.get(var, len(idxs) + 1)
        mean_b = float(sum(beta[i] for i in idxs)) / float(m)
        for i in idxs:
            beta[i] -= mean_b
        if intercept_idx is not None:
            beta[intercept_idx] += mean_b
        base_coeffs[var] = -mean_b
    return base_coeffs
