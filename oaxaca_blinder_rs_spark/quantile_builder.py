"""Machado-Mata quantile decomposition (SURVEY M13).

Reference: /root/reference/oaxaca_blinder/src/quantile_decomposition.rs.

Three fit engines, one semantics:

- 'driver': collect group matrices once, thread-pooled NumPy fits — the
  reference's rayon design (quantile_decomposition.rs:221-229), guarded by
  COLLECT_LIMIT_CELLS;
- 'distributed' (scale path): Gram-Newton on the convolution-smoothed check
  loss (conquer-style smoothed QR) — every (replicate, group, tau) quantile
  regression iterates simultaneously, each Newton iteration one mapInPandas
  pass emitting score/Hessian Gram partials; only O(models x k^2)
  statistics ever reach the driver, data never duplicates across replicates
  or taus. Smoothing (h = 0.01 x sd) makes the optimum unique, so the
  distributed reduce's summation order cannot move the argmin along the
  check loss's flat faces (it moved IRLS by ~0.3% of outcome scale);
- 'taubatch' (legacy): per-tau-batch fan-out where each task holds one full
  group — kept for parity testing.

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
from .operators.quantile_regression import solve_qr, solve_qr_exact
from .results import ComponentResult

INTERCEPT = "__ob_intercept__"
COLLECT_LIMIT_CELLS = 50_000_000

# Gram-engine smoothing schedule (see _fit_gram): target bandwidth fraction
# of sd(y), anneal start fraction, per-pass shrink. Module-level so the
# schedule-invariance test can vary the HOMOTOPY PATH and assert the
# converged answer (the unique optimum of the target-h loss) doesn't move.
GRAM_H_FRAC = 0.01
GRAM_H0_FRAC = 0.5
# r8: SHRINK 0.125 (target h one pass earlier) was tried and reverted —
# the tied parity fixture's flat faces need the gentler 0.25 homotopy
# (the 8x per-pass h jump overshoots the moving optimum and the damped
# iterate lands on a different face vertex than taubatch's LP solution).
# r12: (H0 0.125, SHRINK 0.1) and (H0 0.25, SHRINK 0.25) prototyped for the
# cadence ask — 15-18% faster at sf0.1 (in-process ABAB, value drift
# <= 7.3e-12) but BOTH strand a degenerate small-n bootstrap resample of
# the tied parity fixture in the zero-curvature far field (its replicate
# fit blows std_err 0.59 -> 33, the r8 failure mode) — rejected with data;
# profile + ABAB table in NOTES_r12. Do not re-propose without a
# per-model adaptive anneal start.
GRAM_SHRINK = 0.25
# r13: the per-model adaptive anneal start the r12 rejection called for.
# The r12 data said a 0.125 x sd start is safe for EVERY real-data model
# (uniform-0.125 ABAB converged with value drift <= 7.3e-12) and fails only
# for degenerate small-n bootstrap resamples. What "degenerate" turns out
# to mean, measured on the tied parity fixture (r13): NOT OLS interpolation
# (the stranding replicate's sd_resid/sd is ~0.7, same as real data) but
# KERNEL STARVATION — with n = 20 rows per side, a 0.125 x sd start puts
# the expected number of points inside the kernel window at
# n x h0 / sd_resid ~ 3.6, so the smoothed Hessian is built from ~zero
# effective observations and the first Newton step leaves the basin (the
# r8 failure mode; std_err 0.707 -> 48 when the ratio-only rule was tried
# first this round). Both hazards are detectable driver-side for free from
# the init pass's own Gram stats (SSR = y'Wy - 2 b'X'Wy + b'X'WXb):
#   1. sd_resid >= GRAM_ADAPT_MIN_RESID_RATIO x sd(y) — an interpolating
#      fit (sd_resid ~ 0) must keep the conservative start;
#   2. n x (GRAM_H0_ADAPT_FRAC x sd) / sd_resid >= GRAM_ADAPT_MIN_KERNEL_MASS
#      — the start bandwidth must cover enough observations to estimate
#      curvature (real sf0.1 sides run ~1e5+, fixtures ~20: cleanly split).
# Models passing BOTH start at GRAM_H0_ADAPT_FRAC x sd — one fewer anneal
# pass (12.5 x 0.25^2 < 1 vs 50 x 0.25^3 < 1); anything suspicious keeps
# the proven GRAM_H0_FRAC schedule, so every prior fixture is bit-safe.
GRAM_H0_ADAPT_FRAC = 0.125
GRAM_ADAPT_MIN_RESID_RATIO = 0.25
GRAM_ADAPT_MIN_KERNEL_MASS = 64.0



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


def mm_tau_stream(seed: int, S: int, rep: int = -1) -> np.ndarray:
    """The Machado-Mata tau draw stream, exactly as the engines consume it
    (quantile_decomposition.rs:96-101 semantics): rep -1 (the point pass)
    draws S uniforms on [0.01, 0.99) from a fresh default_rng(seed); rep
    r >= 0 from default_rng([seed, 7, r]). Public so the driver contract
    can pin the stream itself: the mm_tau_stream oracle replays SeedSequence
    + PCG64 + the uniform transform in DuckDB SQL (functions/pcg64_sql.py)
    and hash-matches these doubles BIT-FOR-BIT — the simulation entropy is
    no longer an un-oracle-able input."""
    if rep < 0:
        return np.random.default_rng(seed).uniform(0.01, 0.99, size=S)
    return np.random.default_rng([seed, 7, rep]).uniform(0.01, 0.99, size=S)


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
        self._fit_engine = "auto"
        self._design_cache = None

    def predictors(self, cols) -> "QuantileDecompositionBuilder":
        self._predictors = list(cols)
        self._design_cache = None  # design-shaping setter: drop the memo
        return self

    def categorical_predictors(self, cols) -> "QuantileDecompositionBuilder":
        self._categorical_predictors = list(cols)
        self._design_cache = None  # design-shaping setter: drop the memo
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
        """'auto' (default): 'driver' when the design fits the driver collect
        limit (cells counted BEFORE collecting), else 'distributed' — a user
        at scale gets the Gram engine instead of an error.

        'driver': collect group matrices once, thread-pooled NumPy fits
        (reference's rayon shape; COLLECT_LIMIT-guarded). Each fit is the
        exact LP-vertex optimum (solve_qr_exact: IRLS warm start + simplex
        basis exchange) — the reference's interior-point semantics
        (quantile_regression.rs:22-129) without an LP dependency.

        'distributed' (the scale path): Gram-Newton on the smoothed check
        loss — every (replicate, group, tau) quantile regression iterates
        simultaneously; each Newton iteration is ONE mapInPandas pass over
        the unexploded projection computing smoothed score/Hessian Gram
        partials (X'DX upper triangle, X'v) for all active models with two
        BLAS GEMMs per partition, and the driver performs the k x k solves. No row is ever duplicated across
        replicates or taus — resampling is multiplicity-weighted via
        ``exact_n_counts`` — so shuffle volume is O(n) per iteration and
        driver traffic is O(models x k^2), independent of n.

        'taubatch' (legacy distributed): replicate x tau-batch fan-out via
        applyInPandas where each executor task holds ONE group's full rows —
        n x (B+1) x n_batches rows cross the shuffle. Kept for parity
        testing; superseded by the Gram engine at scale.
        """
        if engine not in ("auto", "driver", "distributed", "taubatch"):
            raise ValueError("fit engine must be 'auto', 'driver', 'distributed' or 'taubatch'")
        self._fit_engine = engine
        return self

    # -- Spark side: prep + matrix extraction ---------------------------------
    def _prepare_design(self):
        # memoized: the 'auto' engine resolution and the chosen engine both
        # need it; the dummy-level and group-level distinct scans run once.
        # Design-shaping setters (predictors/categorical_predictors) reset
        # the memo so a run() -> reconfigure -> run() sequence refits on the
        # new design instead of silently reusing the stale one.
        if self._design_cache is not None:
            return self._design_cache
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
        self._design_cache = (df, xcols, group_a, group_b)
        return self._design_cache

    def _prepare(self):
        df, xcols, group_a, group_b = self._prepare_design()
        out = {}
        for g in (group_a, group_b):
            sub = df.filter(F.col(self._group) == F.lit(g)).select(*xcols, self._outcome)
            n_rows = sub.count()
            if n_rows * len(xcols) > COLLECT_LIMIT_CELLS:
                # guard BEFORE collecting — the old post-toPandas check could
                # OOM the driver on the way to raising
                raise OaxacaError(
                    "Group matrix exceeds the driver collect limit for Machado-Mata; "
                    "use fit_engine('distributed') (or 'auto'), or raise COLLECT_LIMIT_CELLS"
                )
            pdf = sub.toPandas()
            if len(pdf) < 2:
                raise InvalidGroupVariable("One group has insufficient data")
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
                return solve_qr_exact(X, y, tau)
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

    # -- distributed engines --------------------------------------------------
    def _run_distributed(self, strategy: str = "gram") -> QuantileDecompositionResults:
        """Shared distributed orchestration: prepare + rank rows, draw taus,
        fit every (replicate, group, tau) quantile regression via the chosen
        strategy ('gram' = per-iteration weighted Gram aggregation, 'taubatch'
        = legacy full-group fan-out), then run the simulation/effects stage on
        the driver from the S x k beta table and the sampled covariate rows.

        Bootstrap: exact-n resampling is defined by a deterministic
        per-(rep, side) stream (numpy SeedSequence of [seed, 11, rep, side]);
        executors regenerate it in-task (taubatch materializes the resample,
        gram uses its multiplicity vector as weights — identical estimator)
        and the driver regenerates the identical index array to translate
        simulation picks back to original row ranks, so no resampled data is
        ever shuffled and reruns reproduce exactly. RNG stream layout differs
        from the driver engine (independent per-rep streams instead of one
        sequential rng); statistically equivalent, documented divergence.
        """
        from pyspark.sql import Window

        import time as _time

        stage_times: list[tuple[str, float]] = []  # instrumentation (r15)
        self._mm_stage_times = stage_times
        _t_stage = _time.perf_counter()

        def _mark(name: str) -> None:
            nonlocal _t_stage
            now = _time.perf_counter()
            stage_times.append((name, now - _t_stage))
            _t_stage = now

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
        # (and the driver's pick translation); checkpoint pins the ids.
        # A window partitioned only by group would funnel each group through
        # one task; ranking instead shuffles on (group, source partition) —
        # P*|groups| uniform cells — with per-cell offsets from one tiny
        # count aggregation (monotonically_increasing_id is
        # (partition << 33) + local index, so (group, pid) counts in pid
        # order are exactly the mid-order prefix sizes).
        # CHECKPOINT BEFORE the offsets collect, not after the join: the
        # offsets job and the rank-window job otherwise execute the plan
        # twice, and AQE may lay out the upstream exchange differently
        # between them (observed at small SFs with a sorted input) — the
        # per-(group, pid) counts then describe a DIFFERENT layout than
        # the one the window ranks, silently scrambling the pick
        # translation and breaking exact rerun reproducibility. Pinning
        # the ids first makes both jobs read the same materialized layout
        # (and replaces, rather than adds to, the post-join checkpoint:
        # the join+window is deterministic given pinned input).
        design = design.withColumn("__mm_mid", F.monotonically_increasing_id()).withColumn(
            "__mm_pid", F.shiftrightunsigned(F.col("__mm_mid"), 33)
        ).localCheckpoint()
        _mark("design_checkpoint")
        cell_rows = (
            design.groupBy(self._group, "__mm_pid")
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        )
        _mark("offsets_collect")
        offs, running = [], {}
        for r in sorted(cell_rows, key=lambda r: (str(r[self._group]), int(r["__mm_pid"]))):
            g = r[self._group]
            offs.append((g, int(r["__mm_pid"]), running.get(g, 0)))
            running[g] = running.get(g, 0) + int(r["__c"])
        gtype = dict(design.dtypes)[self._group]
        off_df = spark.createDataFrame(offs, f"`{self._group}` {gtype}, __mm_pid long, __mm_off long")
        w = Window.partitionBy(self._group, "__mm_pid").orderBy("__mm_mid")
        ranked = (
            design.join(F.broadcast(off_df), [self._group, "__mm_pid"])
            .withColumn("__mm_rn", F.col("__mm_off") + F.row_number().over(w) - 1)
            .drop("__mm_pid", "__mm_off")
        )
        n_a, n_b = int(running[group_a]), int(running[group_b])

        _mark("rank_plan")
        if strategy == "taubatch":
            betas = self._fit_taubatch(
                spark, ranked, xcols, group_a, group_b, taus_by_rep, n_a, n_b
            )
        else:
            betas = self._fit_gram(
                spark, ranked, xcols, group_a, group_b, taus_by_rep, n_a, n_b
            )
        _mark("fit")

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

        _mark("plans")
        want = ranked.filter(
            ((F.col(self._group) == group_a) & F.col("__mm_rn").isin(sorted(needed[group_a])))
            | ((F.col(self._group) == group_b) & F.col("__mm_rn").isin(sorted(needed[group_b])))
        ).select(self._group, "__mm_rn", *xcols).collect()
        _mark("want_collect")
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

    def _fit_taubatch(
        self, spark, ranked, xcols, group_a, group_b, taus_by_rep, n_a, n_b
    ) -> dict[tuple[int, int], list[np.ndarray]]:
        """Legacy fan-out: applyInPandas over (rep, group, tau-batch) keys —
        each executor task holds ONE group's full rows (materializing the
        exact-n resample for rep >= 0) and fits its batch of taus with
        ``solve_qr``. n x (B+1) x n_batches rows cross the shuffle."""
        import pandas as pd

        B = self._bootstrap_reps
        S = self._simulations
        seed = self._seed

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
        # project to the columns fit_batch reads BEFORE replicating: every
        # surviving byte crosses the shuffle (B+1) x n_batches times, so the
        # dead __mm_mid (and anything else the design carries) is multiplied
        # dead weight. Output-identical: fit_batch sorts by __mm_rn and reads
        # named columns only.
        thin = ranked.select(self._group, self._outcome, *xcols, "__mm_rn")
        replicated = thin.crossJoin(F.broadcast(rb_df))

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
                    beta = solve_qr_exact(X, y, tau)
                    out.append((rep, gval, int(ti), [float(v) for v in beta], True))
                except Exception:
                    out.append((rep, gval, int(ti), [], False))
            return pd.DataFrame(out, columns=["rep", "grp", "tau_idx", "beta", "ok"])

        import time as _time

        _t0 = _time.perf_counter()
        beta_rows = (
            replicated.groupBy("__mm_rep", self._group, "__mm_batch")
            .applyInPandas(fit_batch, "rep int, grp string, tau_idx int, beta array<double>, ok boolean")
            .collect()
        )
        self._taubatch_collect_sec = _time.perf_counter() - _t0  # instrumentation
        self._taubatch_n_batches = n_batches
        betas: dict[tuple[int, int], list[np.ndarray]] = {}
        for row in sorted(
            (r for r in beta_rows if r["ok"]), key=lambda r: (int(r["rep"]), int(r["tau_idx"]))
        ):
            side = 0 if row["grp"] == group_a else 1
            betas.setdefault((int(row["rep"]), side), []).append(np.array(row["beta"]))
        return betas

    def _fit_gram(
        self, spark, ranked, xcols, group_a, group_b, taus_by_rep, n_a, n_b
    ) -> dict[tuple[int, int], list[np.ndarray]]:
        """Gram-Newton on the convolution-smoothed check loss: all (rep,
        side, tau) quantile regressions iterate simultaneously; each Newton
        iteration is one mapInPandas pass over the unexploded projection.

        Solver: conquer-style smoothed quantile regression (Fernandes, Guerre
        & Horowitz 2021 JoE; He, Pan, Tan & Zhou 2023 "smoothed quantile
        regression with large-scale inference") — minimize (rho_tau * K_h)(r)
        with a Gaussian kernel. Why not the exact check loss here: on tied /
        discrete data the check-loss argmin is a FLAT face whose interior
        IRLS traverses slowly and lands on chaotically (the stop point moves
        by O(face diameter) under summation-order perturbation, which a
        distributed reduce cannot pin). The smoothed loss is smooth and
        strictly convex, so its minimizer is UNIQUE, Newton converges in
        ~6-10 passes, and partition/summation order moves the result by
        ~1e-10 (measured), not hundreds. Bandwidth h = 0.01 x sd_rep(y):
        smoothing bias is O(h^2) and measured effects sit within ~0.1% of
        the exact-LP-vertex oracle — inside the documented 0.3% flat-face
        bound that already governs IRLS-vs-LP divergence. Globalization:
        anneal h from 1.0 x sd (halving per pass) plus driver-side adaptive
        damping and a trust clamp (see the Newton loop below).

        Per pass each partition emits ONE row per group side holding the
        flattened (L + k) x m_active block [Ptri' (d_m c_rep); X' (v_m
        c_rep)] where d/v are the smoothed-loss Hessian/score row weights,
        Ptri the n x k(k+1)/2 upper-triangle product matrix, and c_rep the
        exact-n resample multiplicities (``exact_n_counts``) — a
        count-weighted fit is the identical estimator to fitting the
        materialized resample. Shuffle volume is O(n) data + O(partitions x
        models x k^2) stats regardless of reps — the 100x-scale fix for the
        crossJoin fan-out. Converged (rep, side, tau) models leave the
        payload, so late passes compute only stragglers. Reference
        semantics: quantile_regression.rs:22-129 (same population target;
        the reference's Clarabel LP picks a vertex of the same optimal
        face).
        """
        import pandas as pd

        B = self._bootstrap_reps
        S = self._simulations
        seed = self._seed
        gcol = self._group
        outcome = self._outcome
        k = len(xcols)
        tri = [(i, j) for i in range(k) for j in range(i, k)]
        L = len(tri)
        MAX_ITER, TOL, RIDGE = 60, 1e-9, 1e-12
        # Anneal schedule: h starts at H0_FRAC x sd and shrinks by SHRINK per
        # pass down to the H_FRAC x sd target. The converged result is the
        # unique optimum of the TARGET-h smoothed loss, so the schedule only
        # affects globalization robustness and pass count, not the answer:
        # (0.5, 0.25) reaches target at pass 3 (50 x 0.25^3 < 1) instead of
        # the old (1.0, 0.5)'s pass 7 — ~40% fewer full-data passes, with
        # the adaptive damping + trust clamp absorbing the larger h steps.
        H_FRAC, H0_FRAC, SHRINK = GRAM_H_FRAC, GRAM_H0_FRAC, GRAM_SHRINK
        # CHUNK bounds the n_p x CHUNK residual/weight blocks per task.
        # Profiled at n_p ~ 12.5k (sf0.1 / 32 partitions): 64-wide blocks
        # (~6 MB working set, L2/L3-resident) run the identical arithmetic
        # ~2.8x faster than the old 256-wide blocks, whose ~25 MB
        # temporaries thrash cache across the ~10 full-size intermediates.
        CHUNK = 64

        par = spark.sparkContext.defaultParallelism
        proj = (
            ranked.select(gcol, "__mm_rn", outcome, *xcols)
            .repartition(par)
            .localCheckpoint()
        )

        rep_list = list(range(-1, B))
        side_of = {group_a: 0, group_b: 1}
        n_by_side = {0: n_a, 1: n_b}
        models = [(r, s, t) for r in rep_list for s in (0, 1) for t in range(S)]
        M = len(models)
        model_rep = np.array([m[0] for m in models], dtype=np.int64)
        model_side = np.array([m[1] for m in models], dtype=np.int64)
        model_tidx = np.array([m[2] for m in models], dtype=np.int64)
        model_tau = np.array([taus_by_rep[r][t] for (r, s, t) in models])
        betas_arr = np.zeros((M, k))
        status = np.zeros(M, dtype=np.int8)  # 0 active, 1 converged/stopped, 2 failed
        xcols_l = list(xcols)
        tri_l = list(tri)
        n_by_side_l = dict(n_by_side)
        side_of_l = dict(side_of)

        import time as _time

        pass_times: list[tuple[str, int, float]] = []  # (mode, active, sec)
        self._gram_pass_times = pass_times  # instrumentation, NOTES_r12

        def run_pass(payload: dict) -> dict[int, np.ndarray]:
            """One mapInPandas pass. payload: side -> dict(mode, ureps[,
            repcol, taus, betas, h]). Returns side -> summed stat block:
            (L+k+3) x nreps for mode 'ols' (adds count/sum/sumsq y-moment
            rows for the bandwidth), (L+k) x m for mode 'newton'."""
            _t0 = _time.perf_counter()

            def compute(iterator, payload=payload):
                from pyspark import TaskContext

                from oaxaca_blinder_rs_spark.functions.mathx import erf_np
                from oaxaca_blinder_rs_spark.operators.quantile_regression import (
                    exact_n_counts,
                )

                _SQRT2 = np.sqrt(2.0)
                _SQRT2PI = np.sqrt(2.0 * np.pi)

                ctx = TaskContext.get()
                pid = ctx.partitionId() if ctx is not None else 0
                by: dict = {}
                for pdf in iterator:
                    for gval, sub in pdf.groupby(gcol, sort=False):
                        by.setdefault(gval, []).append(sub)
                rows = []
                for gval, parts in by.items():
                    s = side_of_l[gval]
                    pl = payload.get(s)
                    if pl is None:
                        continue
                    sub = pd.concat(parts, ignore_index=True)
                    X = sub[xcols_l].to_numpy(dtype=np.float64)
                    y = sub[outcome].to_numpy(dtype=np.float64)
                    rn = sub["__mm_rn"].to_numpy(dtype=np.int64)
                    n_side = n_by_side_l[s]
                    ureps = pl["ureps"]
                    C = np.empty((len(rn), len(ureps)))
                    for ci, r in enumerate(ureps):
                        if r < 0:
                            C[:, ci] = 1.0
                        else:
                            C[:, ci] = exact_n_counts(seed, int(r), s, n_side)[rn]
                    P = np.empty((len(rn), L))
                    for c0, (i, j) in enumerate(tri_l):
                        P[:, c0] = X[:, i] * X[:, j]
                    if pl["mode"] == "ols":
                        W = C  # one init model per unique rep, unit weights
                        ymom = np.stack(
                            [C.sum(axis=0), y @ C, (y * y) @ C], axis=0
                        )
                        stat = np.concatenate(
                            [P.T @ W, X.T @ (W * y[:, None]), ymom], axis=0
                        )
                    else:
                        m = len(pl["taus"])
                        stat = np.empty((L + k, m))
                        for c0 in range(0, m, CHUNK):
                            sl = slice(c0, min(c0 + CHUNK, m))
                            Z = (y[:, None] - X @ pl["betas"][sl].T) / pl["h"][None, sl]
                            Cs = C[:, pl["repcol"][sl]]
                            # smoothed check loss (Gaussian kernel):
                            # score v = tau - 1 + Phi(z), curvature d =
                            # phi(z)/h — evaluated SPARSELY: for |z| >= 40,
                            # erf(z/sqrt(2)) is exactly +-1 in doubles
                            # (CALERF XBIG ~ 26.5 < 40/sqrt(2)) and
                            # exp(-z^2/2) underflows to exactly 0, so the
                            # far field contributes V = (tau-1) + {0,1} and
                            # D = 0 BIT-IDENTICALLY to the dense evaluation
                            # while skipping erf/exp for the ~75-95% of
                            # residuals outside the kernel window once h
                            # nears target (fp addition is commutative, so
                            # (tau-1)+step == dense's tau-1+0.5(1+erf)).
                            W = np.where(Z > 0, 1.0, 0.0)
                            W += pl["taus"][None, sl] - 1.0
                            rows_in, cols_in = np.nonzero(np.abs(Z) < 40.0)
                            zin = Z[rows_in, cols_in]
                            W[rows_in, cols_in] = (
                                pl["taus"][sl][cols_in] - 1.0
                            ) + 0.5 * (1.0 + erf_np(zin / _SQRT2))
                            DC = np.zeros_like(Z)
                            DC[rows_in, cols_in] = (
                                np.exp(-0.5 * zin * zin)
                                / (_SQRT2PI * pl["h"][sl][cols_in])
                            ) * Cs[rows_in, cols_in]
                            stat[:L, sl] = P.T @ DC
                            W *= Cs
                            stat[L:, sl] = X.T @ W
                    rows.append((int(s), int(pid), stat.ravel(order="F").tolist()))
                yield pd.DataFrame(rows, columns=["side", "pid", "stats"])

            pdf_all = proj.mapInPandas(
                compute, schema="side int, pid int, stats array<double>"
            ).toPandas()
            out: dict[int, np.ndarray] = {}
            # fixed (side, pid) summation order -> bit-deterministic reruns
            pdf_all = pdf_all.sort_values(["side", "pid"], kind="mergesort")
            for side_v, grp in pdf_all.groupby("side", sort=True):
                pl = payload[int(side_v)]
                if pl["mode"] == "ols":
                    m, height = len(pl["ureps"]), L + k + 3
                else:
                    m, height = len(pl["taus"]), L + k
                acc = np.zeros((height, m))
                for st in grp["stats"]:
                    acc += np.asarray(st, dtype=np.float64).reshape((height, m), order="F")
                out[int(side_v)] = acc
            mode = next(iter(payload.values()))["mode"]
            active = sum(
                len(pl["taus"]) if pl["mode"] == "newton" else len(pl["ureps"])
                for pl in payload.values()
            )
            pass_times.append((mode, active, _time.perf_counter() - _t0))
            return out

        def solve_block(stats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """Batched k x k solves from stacked stats ((L+k) x m): A from the
            triangle rows, rhs from the tail rows -> (solution m x k, ok
            mask). Serves both the OLS init (A = X'CX, rhs = X'Cy -> beta)
            and the Newton passes (A = Hessian, rhs = score -> step).
            Singular/non-finite models are flagged, not raised."""
            m = stats.shape[1]
            A = np.zeros((m, k, k))
            for idx, (i, j) in enumerate(tri_l):
                A[:, i, j] = stats[idx]
                A[:, j, i] = stats[idx]
            A += RIDGE * np.eye(k)[None, :, :]
            b = stats[L:].T  # m x k
            sol = np.full((m, k), np.nan)
            try:
                sol = np.linalg.solve(A, b)
            except np.linalg.LinAlgError:
                for i in range(m):
                    try:
                        sol[i] = np.linalg.solve(A[i], b[i])
                    except np.linalg.LinAlgError:
                        pass
            ok = np.isfinite(sol).all(axis=1)
            return sol, ok

        # ---- init: count-weighted OLS per (rep, side), shared across taus ----
        # The same pass also collects the count-weighted y moments that set
        # the per-(rep, side) smoothing bandwidth h = H_FRAC x sd(y).
        init_payload = {
            s: {"mode": "ols", "ureps": np.array(rep_list, dtype=np.int64)} for s in (0, 1)
        }
        init_stats = run_pass(init_payload)
        model_h = np.zeros(M)  # target bandwidth per model
        # per-model anneal START as a multiple of the target bandwidth;
        # default = the proven conservative schedule, lowered per model only
        # when the init fit's residual scale certifies the near field (see
        # the GRAM_H0_ADAPT_FRAC constants note)
        model_h0_ratio = np.full(M, H0_FRAC / H_FRAC)
        for s in (0, 1):
            sol, ok = solve_block(init_stats[s][: L + k])
            cnt, sy, syy = init_stats[s][L + k], init_stats[s][L + k + 1], init_stats[s][L + k + 2]
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = sy / cnt
                var = np.maximum(syy / cnt - mean * mean, 0.0)
            sd = np.sqrt(var)
            for ri, r in enumerate(rep_list):
                sel = (model_rep == r) & (model_side == s)
                if ok[ri]:
                    betas_arr[sel] = sol[ri]
                    # degenerate (constant-y) resamples get an absolute floor
                    model_h[sel] = max(H_FRAC * sd[ri], 1e-8 * (1.0 + abs(mean[ri])))
                    if sd[ri] > 0.0 and cnt[ri] > 0.0:
                        # SSR from the already-summed Gram stats: zero extra
                        # Spark work. b'X'WXb via the tri block, b'X'Wy via
                        # the score rows.
                        b = sol[ri]
                        g = init_stats[s][L : L + k, ri]
                        quad = 0.0
                        for c0, (i, j) in enumerate(tri_l):
                            aij = init_stats[s][c0, ri]
                            quad += (1.0 if i == j else 2.0) * aij * b[i] * b[j]
                        ssr = max(syy[ri] - 2.0 * float(b @ g) + quad, 0.0)
                        sd_resid = np.sqrt(ssr / cnt[ri])
                        not_interp = sd_resid >= GRAM_ADAPT_MIN_RESID_RATIO * sd[ri]
                        kernel_mass = (
                            cnt[ri] * (GRAM_H0_ADAPT_FRAC * sd[ri]) / sd_resid
                            if sd_resid > 0.0 else 0.0
                        )
                        if not_interp and kernel_mass >= GRAM_ADAPT_MIN_KERNEL_MASS:
                            model_h0_ratio[sel] = GRAM_H0_ADAPT_FRAC / H_FRAC
                else:
                    status[sel] = 2  # degenerate design for this resample
        self._gram_adapt_fast = int(
            (model_h0_ratio[status == 0] < H0_FRAC / H_FRAC - 1e-12).sum()
        )  # instrumentation: models on the shortened schedule
        # NOTE (r8): an anneal start at the OLS residual scale (the r7
        # verdict's suggested lever) was tried and REVERTED — a resample of
        # a small tied fixture can make OLS interpolate (sd_resid ~ 0),
        # which floors h0 at target and strands Newton in the
        # zero-curvature far field (std_err blew up 80x in the parity
        # test), while on the real benchmark data sd_resid ~ 0.7 sd(y)
        # saved no passes at all. The r8 wall-clock win came from the
        # cache-sized CHUNK + sparse far-field kernel instead.

        # ---- Newton loop: one pass per iteration over all active models -----
        # Globalization, all driver-side (no extra Spark passes):
        #   - anneal h_m(it) = max(h_target_m, h0_ratio_m x h_target_m x
        #     SHRINK^(it-1)) with the PER-MODEL start h0_ratio_m (adaptive:
        #     near-field-certified models start at GRAM_H0_ADAPT_FRAC x sd,
        #     suspicious ones keep GRAM_H0_FRAC x sd); a model may converge
        #     only once its bandwidth reached target;
        #   - adaptive damping alpha_m: halved when the raw Newton step norm
        #     grows >1.5x pass-over-pass (overshoot signature: residuals left
        #     the kernel window, Hessian -> 0, steps explode), doubled back
        #     toward 1 otherwise;
        #   - trust clamp ||eff step||_inf <= 0.5 x (1 + max|beta_m|), so a
        #     flat-curvature model can never leave the data's scale.
        # Small-n tied fixtures may ride the cap and keep the last (bounded,
        # near-optimal) iterate — same semantics as solve_qr's max_iter.
        it = 0
        model_prev_sn = np.full(M, np.inf)
        model_alpha = np.ones(M)
        while it < MAX_ITER and (status == 0).any():
            h_now = np.maximum(model_h, model_h0_ratio * model_h * SHRINK ** it)
            it += 1
            payload = {}
            act_idx: dict[int, np.ndarray] = {}
            for s in (0, 1):
                sel = np.where((status == 0) & (model_side == s))[0]
                if len(sel) == 0:
                    continue
                act_idx[s] = sel
                payload[s] = {
                    "mode": "newton",
                    "ureps": np.unique(model_rep[sel]),
                    "taus": model_tau[sel],
                    "betas": betas_arr[sel],
                    "h": h_now[sel],
                }
                payload[s]["repcol"] = np.searchsorted(
                    payload[s]["ureps"], model_rep[sel]
                )
            stats = run_pass(payload)
            for s, sel in act_idx.items():
                step, ok = solve_block(stats[s])
                betas_arr[sel[~ok]] = np.nan
                status[sel[~ok]] = 2
                good = sel[ok]
                sn = np.abs(step[ok]).max(axis=1)
                grow = sn > 1.5 * model_prev_sn[good]
                model_alpha[good] = np.where(
                    grow,
                    np.maximum(model_alpha[good] * 0.5, 1.0 / 64),
                    np.minimum(1.0, model_alpha[good] * 2.0),
                )
                trust = 0.5 * (1.0 + np.abs(betas_arr[good]).max(axis=1))
                eff = step[ok] * model_alpha[good][:, None]
                esn = np.abs(eff).max(axis=1)
                over = esn > trust
                eff[over] *= (trust[over] / esn[over])[:, None]
                betas_arr[good] += eff
                model_prev_sn[good] = sn
                delta = np.abs(eff).max(axis=1)
                scale = 1.0 + np.abs(betas_arr[good]).max(axis=1)
                at_target = h_now[good] <= model_h[good] * 1.0000001
                status[good[at_target & (delta < TOL * scale)]] = 1
        status[status == 0] = 1  # max_iter reached: keep last iterate
        self._gram_passes = it  # instrumentation: full-data Newton passes

        betas: dict[tuple[int, int], list[np.ndarray]] = {}
        order = np.lexsort((model_tidx, model_side, model_rep))
        for mi in order:
            if status[mi] == 1 and np.isfinite(betas_arr[mi]).all():
                betas.setdefault(
                    (int(model_rep[mi]), int(model_side[mi])), []
                ).append(betas_arr[mi].copy())
        return betas

    def run(self) -> QuantileDecompositionResults:
        engine = self._fit_engine
        if engine == "auto":
            # row-guard the engine choice like AkmBuilder.engine("auto"):
            # full-data exact fits on the driver while the design fits the
            # collect limit, the distributed Gram engine past it
            df, xcols, ga, gb = self._prepare_design()
            n = df.filter(F.col(self._group).isin([ga, gb])).count()
            engine = "driver" if n * len(xcols) <= COLLECT_LIMIT_CELLS else "distributed"
        if engine == "distributed":
            return self._run_distributed("gram")
        if engine == "taubatch":
            return self._run_distributed("taubatch")
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
