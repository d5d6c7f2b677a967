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


# Cody/CALERF rational-approximation coefficients (W. J. Cody 1969, the
# algorithm behind netlib specfun ERF and most libm implementations;
# max relative error ~1.2e-16 — double-precision exact for our purposes).
_ERF_A = [3.16112374387056560e00, 1.13864154151050156e02,
          3.77485237685302021e02, 3.20937758913846947e03,
          1.85777706184603153e-1]
_ERF_B = [2.36012909523441209e01, 2.44024637934444173e02,
          1.28261652607737228e03, 2.84423683343917062e03]
_ERF_C = [5.64188496988670089e-1, 8.88314979438837594e00,
          6.61191906371416295e01, 2.98635138197400131e02,
          8.81952221241769090e02, 1.71204761263407058e03,
          2.05107837782607147e03, 1.23033935479799725e03,
          2.15311535474403846e-8]
_ERF_D = [1.57449261107098347e01, 1.17693950891312499e02,
          5.37181101862009858e02, 1.62138957456669019e03,
          3.29079923573345963e03, 4.36261909014324716e03,
          3.43936767414372164e03, 1.23033935480374942e03]
_ERF_P = [3.05326634961232344e-1, 3.60344899949804439e-1,
          1.25781726111229246e-1, 1.60837851487422766e-2,
          6.58749161529837803e-4, 1.63153871373020978e-2]
_ERF_Q = [2.56852019228982242e00, 1.87295284992346047e00,
          5.27905102951428412e-1, 6.05183413124413191e-2,
          2.33520497626869185e-3]
_ERF_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)
_ERF_XBIG = 26.543  # CALERF XBIG: erfc underflows to 0 beyond this


def _erfc_mid(y: Column) -> Column:
    """erfc(y) for 0.46875 < y <= 4 (CALERF region 2)."""
    xnum = F.lit(_ERF_C[8]) * y
    xden = y
    for i in range(7):
        xnum = (xnum + F.lit(_ERF_C[i])) * y
        xden = (xden + F.lit(_ERF_D[i])) * y
    r = (xnum + F.lit(_ERF_C[7])) / (xden + F.lit(_ERF_D[7]))
    # split exp(-y^2) as exp(-ysq^2)*exp(-del) with ysq = trunc(16y)/16 for
    # full precision in the tail (CALERF's AINT trick)
    ysq = F.floor(y * F.lit(16.0)) / F.lit(16.0)
    dl = (y - ysq) * (y + ysq)
    return F.exp(-ysq * ysq) * F.exp(-dl) * r


def _erfc_far(y: Column) -> Column:
    """erfc(y) for y > 4 (CALERF region 3)."""
    ysq = F.lit(1.0) / (y * y)
    xnum = F.lit(_ERF_P[5]) * ysq
    xden = ysq
    for i in range(4):
        xnum = (xnum + F.lit(_ERF_P[i])) * ysq
        xden = (xden + F.lit(_ERF_Q[i])) * ysq
    r = ysq * (xnum + F.lit(_ERF_P[4])) / (xden + F.lit(_ERF_Q[4]))
    r = (F.lit(_ERF_SQRPI) - r) / y
    ysq2 = F.floor(y * F.lit(16.0)) / F.lit(16.0)
    dl = (y - ysq2) * (y + ysq2)
    # underflows to 0.0 for y >~ 26.5, matching libm erfc
    return F.exp(-ysq2 * ysq2) * F.exp(-dl) * r


def erf_expr(x: Column) -> Column:
    """erf(x) as a pure Catalyst expression (whole-stage-codegen friendly).

    Cody's CALERF rational approximations; agrees with java.lang.Math/libm
    erf to <1e-15 absolute (validated against Python math.erf in
    tests/test_mathx_erf.py). Unlike a `java_method` reflection call this is
    deterministic, so it may sit inside aggregate expressions, and it compiles
    into whole-stage codegen (~2x faster scans than reflective erf).
    """
    y = F.abs(x)
    # region 1: |x| <= 0.46875 -> erf directly
    ysq = y * y
    xnum = F.lit(_ERF_A[4]) * ysq
    xden = ysq
    for i in range(3):
        xnum = (xnum + F.lit(_ERF_A[i])) * ysq
        xden = (xden + F.lit(_ERF_B[i])) * ysq
    erf_near = x * (xnum + F.lit(_ERF_A[3])) / (xden + F.lit(_ERF_B[3]))

    erfc_tail = F.when(y <= F.lit(4.0), _erfc_mid(y)).otherwise(_erfc_far(y))
    erf_tail = F.when(x > F.lit(0.0), F.lit(1.0) - erfc_tail).otherwise(erfc_tail - F.lit(1.0))
    out = F.when(y <= F.lit(0.46875), erf_near).otherwise(erf_tail)
    # CALERF XBIG cap: erfc underflows to 0 above ~26.543, so erf(x) = sign(x)
    # exactly; also makes erf(+-inf) = +-1 instead of (inf-inf) = NaN. Spark
    # SQL orders NaN above every double, so NaN takes this branch too and
    # signum propagates it.
    return F.when(y >= F.lit(_ERF_XBIG), F.signum(x)).otherwise(out)


def norm_cdf(x: Column) -> Column:
    """Standard normal CDF Phi(x) to machine precision.

    Phi(x) = (1 + erf(x/sqrt2))/2 with a codegen-native erf (erf_expr above);
    matches the reference's statrs Normal::cdf to ~1e-15, which the 1e-4
    statsmodels anchors require. (Earlier builds called commons-math3 Erf via
    `java_method`; the reflective call was ~2x slower per scan and its
    non-deterministic flag forbade use inside aggregates.)
    """
    u = x / F.lit(SQRT_2)
    return (F.lit(1.0) + erf_expr(u)) / F.lit(2.0)


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


# -- vectorized NumPy versions (executor-side Arrow/BLAS engines; no scipy) --

def erf_np(x):
    """Vectorized erf over an ndarray — same CALERF coefficients as erf_expr.

    numpy has no erf without scipy (absent from this container); per-element
    math.erf would be a Python loop in the Pandas-UDF hot path. This is pure
    ndarray arithmetic, <1e-15 vs libm (tests/test_mathx_erf.py).
    """
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    y = np.abs(x)
    # NaN-init so elements no region covers (NaN inputs fail every mask
    # comparison) propagate NaN instead of returning uninitialized memory.
    out = np.full_like(y, np.nan)

    near = y <= 0.46875
    yn = y[near]
    ysq = yn * yn
    xnum = _ERF_A[4] * ysq
    xden = ysq.copy()
    for i in range(3):
        xnum = (xnum + _ERF_A[i]) * ysq
        xden = (xden + _ERF_B[i]) * ysq
    out[near] = x[near] * (xnum + _ERF_A[3]) / (xden + _ERF_B[3])

    mid = (~near) & (y <= 4.0)
    ym = y[mid]
    xnum = _ERF_C[8] * ym
    xden = ym.copy()
    for i in range(7):
        xnum = (xnum + _ERF_C[i]) * ym
        xden = (xden + _ERF_D[i]) * ym
    r = (xnum + _ERF_C[7]) / (xden + _ERF_D[7])
    ysq = np.floor(ym * 16.0) / 16.0
    dl = (ym - ysq) * (ym + ysq)
    erfc_mid = np.exp(-ysq * ysq) * np.exp(-dl) * r

    # CALERF XBIG cap: beyond ~26.543 erfc underflows to 0, so erf = sign(x)
    # exactly; this also turns +-inf into +-1 instead of (inf-inf) = NaN.
    huge = y > _ERF_XBIG
    out[huge] = np.sign(x[huge])

    far = (y > 4.0) & ~huge
    yf = y[far]
    with np.errstate(under="ignore", divide="ignore"):
        ysq = 1.0 / (yf * yf)
        xnum = _ERF_P[5] * ysq
        xden = ysq.copy()
        for i in range(4):
            xnum = (xnum + _ERF_P[i]) * ysq
            xden = (xden + _ERF_Q[i]) * ysq
        r = ysq * (xnum + _ERF_P[4]) / (xden + _ERF_Q[4])
        r = (_ERF_SQRPI - r) / yf
        ysq2 = np.floor(yf * 16.0) / 16.0
        dl = (yf - ysq2) * (yf + ysq2)
        erfc_far = np.exp(-ysq2 * ysq2) * np.exp(-dl) * r

    for mask, erfc in ((mid, erfc_mid), (far, erfc_far)):
        sgn = np.sign(x[mask])
        out[mask] = np.where(sgn > 0, 1.0 - erfc, erfc - 1.0)
    return out


def norm_cdf_np(x):
    import numpy as np

    return 0.5 * (1.0 + erf_np(np.asarray(x, dtype=np.float64) / SQRT_2))


def norm_pdf_np(x):
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    return np.exp(-x * x / 2.0) / SQRT_2PI


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
