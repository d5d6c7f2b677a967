"""Machado-Mata quantile decomposition (SURVEY M13).

Reference: /root/reference/oaxaca_blinder/src/quantile_decomposition.rs.

Spark's role here is preparation (clean, dummies, group split) and the
group-matrix extraction; the 2S quantile-regression fits and the simulation
are deliberately driver-side NumPy with a thread pool — exactly the
reference's rayon design (quantile_decomposition.rs:221-229), because every
QR fit needs the whole group's rows. A `collect_limit` guards the driver; for
data beyond it, fit per-tau batches with applyInPandas (each executor task
still needs one full group in memory — QR is not shuffle-decomposable).

Determinism: tau draws, simulation row picks and bootstrap resamples all come
from numpy Generators seeded from the builder seed (the reference uses
thread_rng — unseeded; we improve on that, SURVEY §7.1).
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .errors import InvalidGroupVariable, OaxacaError
from .operators.bootstrap import bootstrap_stats
from .operators.quantile_regression import solve_qr
from .results import ComponentResult

INTERCEPT = "__ob_intercept__"
COLLECT_LIMIT_CELLS = 50_000_000


@dataclass
class QuantileDecompositionDetail:
    total_gap: ComponentResult
    characteristics_effect: ComponentResult
    coefficients_effect: ComponentResult


@dataclass
class QuantileDecompositionResults:
    """quantile_decomposition.rs:451-459."""

    results_by_quantile: dict[str, QuantileDecompositionDetail]
    n_a: int
    n_b: int

    def summary(self) -> str:
        lines = ["Machado-Mata Quantile Decomposition", "=" * 40,
                 f"Group A: {self.n_a} obs; Group B (reference): {self.n_b} obs", ""]
        for key in sorted(self.results_by_quantile, key=lambda s: float(s[1:])):
            d = self.results_by_quantile[key]
            lines.append(
                f"{key}: gap={d.total_gap.estimate:.4f} "
                f"characteristics={d.characteristics_effect.estimate:.4f} "
                f"coefficients={d.coefficients_effect.estimate:.4f}"
            )
        out = "\n".join(lines)
        print(out)
        return out


def _empirical_quantile(data: np.ndarray, q: float) -> float:
    """Naive floor-index convention (quantile_decomposition.rs:164-171, A8)."""
    if len(data) == 0:
        return 0.0
    s = np.sort(data)
    idx = min(int(len(s) * q), len(s) - 1)
    return float(s[idx])


class QuantileDecompositionBuilder:
    """Mirror of QuantileDecompositionBuilder (quantile_decomposition.rs:46-94).

    Defaults: quantiles [0.1,0.25,0.5,0.75,0.9], simulations=200,
    bootstrap_reps=20.
    """

    def __init__(self, dataframe: DataFrame, outcome: str, group: str, reference_group: str):
        self._df = dataframe
        self._outcome = outcome
        self._group = group
        self._reference_group = reference_group
        self._predictors: list[str] = []
        self._categorical_predictors: list[str] = []
        self._quantiles = [0.1, 0.25, 0.5, 0.75, 0.9]
        self._simulations = 200
        self._bootstrap_reps = 20
        self._seed = 42
        self._threads = 8
        self._fit_engine = "driver"

    def predictors(self, cols) -> "QuantileDecompositionBuilder":
        self._predictors = list(cols)
        return self

    def categorical_predictors(self, cols) -> "QuantileDecompositionBuilder":
        self._categorical_predictors = list(cols)
        return self

    def quantiles(self, qs) -> "QuantileDecompositionBuilder":
        self._quantiles = list(qs)
        return self

    def simulations(self, s: int) -> "QuantileDecompositionBuilder":
        self._simulations = int(s)
        return self

    def bootstrap_reps(self, reps: int) -> "QuantileDecompositionBuilder":
        self._bootstrap_reps = int(reps)
        return self

    def seed(self, seed: int) -> "QuantileDecompositionBuilder":
        self._seed = int(seed)
        return self

    def fit_engine(self, engine: str) -> "QuantileDecompositionBuilder":
        """'driver': collect group matrices once, thread-pooled NumPy fits
        (reference's rayon shape; COLLECT_LIMIT-guarded). 'distributed':
        tau-batch fan-out via applyInPandas — each executor task holds ONE
        group's rows and fits its batch of taus; only the S x k beta table
        returns to the driver. Executor-memory bound instead of driver-bound.
        """
        if engine not in ("driver", "distributed"):
            raise ValueError("fit engine must be 'driver' or 'distributed'")
        self._fit_engine = engine
        return self

    # -- Spark side: prep + matrix extraction ---------------------------------
    def _prepare_design(self):
        cols = [self._outcome, self._group] + self._predictors + self._categorical_predictors
        existing = set(self._df.columns)
        for c in cols:
            if c not in existing:
                raise OaxacaError(f"Column not found: {c}")
        df = self._df.select(*cols).dropna(subset=cols)

        dummy_names: list[str] = []
        for var in self._categorical_predictors:
            levels = [r[0] for r in df.select(var).distinct().orderBy(var).collect() if r[0] is not None]
            for lv in levels[1:]:
                name = f"{var}_{lv}"
                df = df.withColumn(name, (F.col(var) == F.lit(lv)).cast("double"))
                dummy_names.append(name)

        uniques = [r[0] for r in df.select(self._group).distinct().orderBy(self._group).collect() if r[0] is not None]
        if len(uniques) < 2:
            raise InvalidGroupVariable("Not enough groups")
        group_b = self._reference_group
        group_a = uniques[0] if uniques[0] != group_b else uniques[1]

        xcols = [INTERCEPT] + self._predictors + dummy_names
        df = df.withColumn(INTERCEPT, F.lit(1.0))
        for p in self._predictors:
            df = df.withColumn(p, F.col(p).cast("double"))
        return df, xcols, group_a, group_b

    def _prepare(self):
        df, xcols, group_a, group_b = self._prepare_design()
        out = {}
        for g in (group_a, group_b):
            sub = df.filter(F.col(self._group) == F.lit(g)).select(*xcols, self._outcome)
            pdf = sub.toPandas()
            if len(pdf) < 2:
                raise InvalidGroupVariable("One group has insufficient data")
            if len(pdf) * len(xcols) > COLLECT_LIMIT_CELLS:
                raise OaxacaError(
                    "Group matrix exceeds the driver collect limit for Machado-Mata; "
                    "reduce data or raise COLLECT_LIMIT_CELLS"
                )
            X = pdf[xcols].to_numpy(dtype=np.float64)
            y = pdf[self._outcome].to_numpy(dtype=np.float64)
            out[g] = (X, y)
        return out[group_a], out[group_b], group_a, group_b

    # -- single pass (quantile_decomposition.rs:173-279) -----------------------
    def _single_pass(self, Xa, ya, Xb, yb, rng: np.random.Generator):
        S = self._simulations
        taus = rng.uniform(0.01, 0.99, size=S)

        def fit(args):
            X, y, tau = args
            try:
                return solve_qr(X, y, tau)
            except Exception:
                return None

        with ThreadPoolExecutor(max_workers=self._threads) as pool:
            betas_a = [b for b in pool.map(fit, [(Xa, ya, t) for t in taus]) if b is not None]
            betas_b = [b for b in pool.map(fit, [(Xb, yb, t) for t in taus]) if b is not None]

        if len(betas_a) < S / 2 or len(betas_b) < S / 2:
            raise OaxacaError("Failed to estimate a sufficient number of quantile regressions.")

        m = min(len(betas_a), len(betas_b))
        idx_a = rng.integers(0, Xa.shape[0], size=m)
        idx_b = rng.integers(0, Xb.shape[0], size=m)
        y_aa = np.array([Xa[idx_a[i]] @ betas_a[i] for i in range(m)])
        y_bb = np.array([Xb[idx_b[i]] @ betas_b[i] for i in range(m)])
        y_ab = np.array([Xa[idx_a[i]] @ betas_b[i] for i in range(m)])

        effects = {}
        for tau in self._quantiles:
            q_aa = _empirical_quantile(y_aa, tau)
            q_bb = _empirical_quantile(y_bb, tau)
            q_ab = _empirical_quantile(y_ab, tau)
            effects[f"q{int(tau * 100)}"] = (
                q_aa - q_bb,      # gap
                q_ab - q_bb,      # characteristics
                q_aa - q_ab,      # coefficients
            )
        return effects

    # -- distributed tau-batch fan-out ---------------------------------------
    def _run_distributed(self) -> QuantileDecompositionResults:
        """Each executor task holds ONE group's rows and fits a batch of taus
        (applyInPandas over (rep, group, tau-batch)); only the (B+1) x S x k
        beta table and the sampled covariate rows return to the driver.
        Executor-memory bound, not driver-bound.

        Bootstrap: the fan-out key carries the replicate. Exact-n resampling
        happens INSIDE each task from a deterministic per-(rep, side) stream
        (numpy SeedSequence of [seed, 11, rep, side]); the driver regenerates
        the identical index array to translate simulation picks back to
        original row ranks, so no resampled data is ever shuffled twice and
        reruns reproduce exactly. RNG stream layout differs from the driver
        engine (independent per-rep streams instead of one sequential rng);
        statistically equivalent, documented divergence.
        """
        import pandas as pd
        from pyspark.sql import Window

        design, xcols, group_a, group_b = self._prepare_design()
        design = design.filter(F.col(self._group).isin([group_a, group_b]))
        spark = design.sparkSession
        B = self._bootstrap_reps
        S = self._simulations
        seed = self._seed

        # tau draws: rep -1 (point pass) consumes default_rng(seed) exactly as
        # before; bootstrap reps use independent spawned streams
        rng0 = np.random.default_rng(seed)
        taus_by_rep = {-1: rng0.uniform(0.01, 0.99, size=S)}
        for r in range(B):
            taus_by_rep[r] = np.random.default_rng([seed, 7, r]).uniform(0.01, 0.99, size=S)

        # stable per-group row rank: fixes row order inside executor tasks
        # (and the driver's pick translation); checkpoint pins the ids
        design = design.withColumn("__mm_mid", F.monotonically_increasing_id())
        w = Window.partitionBy(self._group).orderBy("__mm_mid")
        ranked = design.withColumn("__mm_rn", F.row_number().over(w) - 1).localCheckpoint()
        counts = {r[0]: r[1] for r in ranked.groupBy(self._group).count().collect()}
        n_a, n_b = int(counts[group_a]), int(counts[group_b])

        # sizing: (B+1) x 2 groups x n_batches tasks; shrink batches as the
        # replicate dimension supplies parallelism (data shipped scales with
        # reps x batches)
        par = spark.sparkContext.defaultParallelism
        total_keys = (B + 1) * 2
        n_batches = max(1, min(16, math.ceil(par / total_keys)))
        batch_assign = {b: [i for i in range(S) if i % n_batches == b] for b in range(n_batches)}
        taus_payload = {
            (r, b): [(i, float(taus_by_rep[r][i])) for i in batch_assign[b]]
            for r in range(-1, B)
            for b in range(n_batches)
        }
        rb_df = spark.createDataFrame(
            [(r, b) for r in range(-1, B) for b in range(n_batches)],
            "__mm_rep int, __mm_batch int",
        )
        replicated = ranked.crossJoin(F.broadcast(rb_df))

        outcome = self._outcome
        xcols_local = list(xcols)
        ga = group_a

        def fit_batch(key, pdf):
            rep, gval, batch = int(key[0]), key[1], int(key[2])
            pdf = pdf.sort_values("__mm_rn")
            X = pdf[xcols_local].to_numpy(dtype=np.float64)
            y = pdf[outcome].to_numpy(dtype=np.float64)
            if rep >= 0:  # exact-n resample with replacement, deterministic
                side = 0 if gval == ga else 1
                idx = np.random.default_rng([seed, 11, rep, side]).integers(0, len(y), size=len(y))
                X, y = X[idx], y[idx]
            out = []
            for ti, tau in taus_payload[(rep, batch)]:
                try:
                    beta = solve_qr(X, y, tau)
                    out.append((rep, gval, int(ti), [float(v) for v in beta], True))
                except Exception:
                    out.append((rep, gval, int(ti), [], False))
            return pd.DataFrame(out, columns=["rep", "grp", "tau_idx", "beta", "ok"])

        beta_rows = (
            replicated.groupBy("__mm_rep", self._group, "__mm_batch")
            .applyInPandas(fit_batch, "rep int, grp string, tau_idx int, beta array<double>, ok boolean")
            .collect()
        )
        betas: dict[tuple[int, int], list[np.ndarray]] = {}
        for row in sorted(
            (r for r in beta_rows if r["ok"]), key=lambda r: (int(r["rep"]), int(r["tau_idx"]))
        ):
            side = 0 if row["grp"] == group_a else 1
            betas.setdefault((int(row["rep"]), side), []).append(np.array(row["beta"]))

        # per-rep simulation plan: translate picks into original row ranks
        plans: dict[int, dict] = {}
        needed: dict[str, set[int]] = {group_a: set(), group_b: set()}
        failed = 0
        for r in range(-1, B):
            ba = betas.get((r, 0), [])
            bb = betas.get((r, 1), [])
            if len(ba) < S / 2 or len(bb) < S / 2:
                if r == -1:
                    raise OaxacaError(
                        "Failed to estimate a sufficient number of quantile regressions."
                    )
                failed += 1
                continue
            m = min(len(ba), len(bb))
            if r == -1:
                idx_a = rng0.integers(0, n_a, size=m)
                idx_b = rng0.integers(0, n_b, size=m)
                rank_a, rank_b = idx_a, idx_b
            else:
                rs = np.random.default_rng([seed, 13, r])
                idx_a = rs.integers(0, n_a, size=m)
                idx_b = rs.integers(0, n_b, size=m)
                ia = np.random.default_rng([seed, 11, r, 0]).integers(0, n_a, size=n_a)
                ib = np.random.default_rng([seed, 11, r, 1]).integers(0, n_b, size=n_b)
                rank_a, rank_b = ia[idx_a], ib[idx_b]
            plans[r] = {"ba": ba, "bb": bb, "rank_a": rank_a, "rank_b": rank_b, "m": m}
            needed[group_a].update(int(i) for i in rank_a)
            needed[group_b].update(int(i) for i in rank_b)
        if failed:
            import sys as _sys

            print(
                f"Warning: {failed} out of {B} bootstrap replications failed and "
                f"were discarded. The analysis is based on {B - failed} successful "
                "replications.",
                file=_sys.stderr,
            )

        want = ranked.filter(
            ((F.col(self._group) == group_a) & F.col("__mm_rn").isin(sorted(needed[group_a])))
            | ((F.col(self._group) == group_b) & F.col("__mm_rn").isin(sorted(needed[group_b])))
        ).select(self._group, "__mm_rn", *xcols).collect()
        rows_by = {}
        for r_ in want:
            rows_by[(r_[self._group], int(r_["__mm_rn"]))] = np.array(
                [float(r_[c]) for c in xcols]
            )

        def effects_for(plan) -> dict[str, tuple[float, float, float]]:
            m = plan["m"]
            y_aa = np.array(
                [rows_by[(group_a, int(plan["rank_a"][i]))] @ plan["ba"][i] for i in range(m)]
            )
            y_bb = np.array(
                [rows_by[(group_b, int(plan["rank_b"][i]))] @ plan["bb"][i] for i in range(m)]
            )
            y_ab = np.array(
                [rows_by[(group_a, int(plan["rank_a"][i]))] @ plan["bb"][i] for i in range(m)]
            )
            out = {}
            for tau in self._quantiles:
                q_aa = _empirical_quantile(y_aa, tau)
                q_bb = _empirical_quantile(y_bb, tau)
                q_ab = _empirical_quantile(y_ab, tau)
                out[f"q{int(tau * 100)}"] = (q_aa - q_bb, q_ab - q_bb, q_aa - q_ab)
            return out

        point = effects_for(plans[-1])
        boot = [effects_for(plans[r]) for r in range(B) if r in plans]

        def comp(name, est, dist):
            se, p, (lo, hi) = bootstrap_stats(dist, est)
            t = est / se if (se == se and abs(se) > 1e-9) else 0.0
            return ComponentResult(name=name, estimate=est, std_err=se, t_stat=t,
                                   p_value=p, ci_lower=lo, ci_upper=hi)

        results = {}
        for key, (gap, char, coeff) in point.items():
            results[key] = QuantileDecompositionDetail(
                total_gap=comp("Total Gap", gap, [b[key][0] for b in boot if key in b]),
                characteristics_effect=comp(
                    "Characteristics", char, [b[key][1] for b in boot if key in b]
                ),
                coefficients_effect=comp(
                    "Coefficients", coeff, [b[key][2] for b in boot if key in b]
                ),
            )
        return QuantileDecompositionResults(
            results_by_quantile=results, n_a=n_a, n_b=n_b
        )

    def run(self) -> QuantileDecompositionResults:
        if self._fit_engine == "distributed":
            return self._run_distributed()
        (Xa, ya), (Xb, yb), group_a, group_b = self._prepare()
        rng = np.random.default_rng(self._seed)
        point = self._single_pass(Xa, ya, Xb, yb, rng)

        boot = []
        for rep in range(self._bootstrap_reps):
            rep_rng = np.random.default_rng(self._seed + 1000 + rep)
            ia = rep_rng.integers(0, Xa.shape[0], size=Xa.shape[0])
            ib = rep_rng.integers(0, Xb.shape[0], size=Xb.shape[0])
            try:
                boot.append(self._single_pass(Xa[ia], ya[ia], Xb[ib], yb[ib], rep_rng))
            except OaxacaError:
                continue

        def comp(name, est, dist):
            se, p, (lo, hi) = bootstrap_stats(dist, est)
            t = est / se if (se == se and abs(se) > 1e-9) else 0.0
            return ComponentResult(name=name, estimate=est, std_err=se, t_stat=t,
                                   p_value=p, ci_lower=lo, ci_upper=hi)

        results = {}
        for key, (gap, char, coeff) in point.items():
            results[key] = QuantileDecompositionDetail(
                total_gap=comp("Total Gap", gap, [b[key][0] for b in boot if key in b]),
                characteristics_effect=comp("Characteristics", char, [b[key][1] for b in boot if key in b]),
                coefficients_effect=comp("Coefficients", coeff, [b[key][2] for b in boot if key in b]),
            )
        return QuantileDecompositionResults(
            results_by_quantile=results, n_a=Xa.shape[0], n_b=Xb.shape[0]
        )
