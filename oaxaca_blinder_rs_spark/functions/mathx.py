"""Scalar math expressions (SURVEY F1-F6), all JVM-side Catalyst expressions.

No Python UDFs here — these compile into whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT_2PI = math.sqrt(2.0 * math.pi)
SQRT_2 = math.sqrt(2.0)


def norm_pdf(x: Column) -> Column:
    """Standard normal density phi(x) (math/probit.rs:41)."""
    return F.exp(-(x * x) / F.lit(2.0)) / F.lit(SQRT_2PI)


def norm_cdf(x: Column) -> Column:
    """Standard normal CDF Phi(x) to machine precision.

    Spark SQL has no erf builtin; commons-math3 ships on Spark's classpath, so
    we call Erf.erf through `java_method` (JVM-side, no Python round-trip —
    reflection overhead only; matches the reference's statrs Normal::cdf to
    ~1e-15, which the 1e-4 statsmodels anchors require).
    """
    u = x / F.lit(SQRT_2)
    erf = F.java_method(F.lit("org.apache.commons.math3.special.Erf"), F.lit("erf"), u)
    return (F.lit(1.0) + erf) / F.lit(2.0)


def sigmoid(x: Column) -> Column:
    """Logistic sigma(x) (math/logit.rs:15-17)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def clamp(x: Column, lo: float, hi: float) -> Column:
    """clamp to [lo, hi] (logit.rs:45; dfl.rs:152)."""
    return F.least(F.greatest(x, F.lit(lo)), F.lit(hi))


def gaussian_kernel(u: Column) -> Column:
    """K(u) = exp(-u^2/2)/sqrt(2 pi) (math/kde.rs:4-6)."""
    return norm_pdf(u)


def indicator_le(y: Column, q: float) -> Column:
    """I(y <= q) as double (math/rif.rs:79-85)."""
    return (y <= F.lit(q)).cast("double")


# -- driver-side scalar versions (for k-sized vectors; no scipy dependency) --

def norm_pdf_scalar(x: float) -> float:
    return math.exp(-x * x / 2.0) / SQRT_2PI


def norm_cdf_scalar(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / SQRT_2))


def norm_ppf_scalar(p: float) -> float:
    """Inverse normal CDF (Acklam's rational approximation, |err|<1.15e-9).

    Used only for scalar z-values (confidence levels) as in
    engine/src/analysis.rs:512-530; accuracy far exceeds need.
    """
    if not 0.0 < p < 1.0:
        if p == 0.0:
            return -math.inf
        if p == 1.0:
            return math.inf
        raise ValueError("p must be in (0,1)")
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow = 0.02425
    phigh = 1 - plow
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
