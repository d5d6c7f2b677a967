"""Profiling operator tests (operators/profiling.py, round 6)."""

import pytest
from pyspark.sql import functions as F

from oaxaca_blinder_rs_spark.operators.profiling import (
    equi_width_histogram,
    profile_columns,
)


def test_histogram_hand_case(spark):
    df = spark.createDataFrame([(float(x),) for x in [0, 1, 2, 3, 4, 4, 10]], "v double")
    rows = {r["bin"]: (r["lo"], r["hi"], r["n"])
            for r in equi_width_histogram(df, "v", bins=5).collect()}
    # range [0,10], width 2: bins [0,2):3 incl 0,1 ... value 10 lands in last bin
    assert rows[0] == (0.0, 2.0, 2)
    assert rows[1] == (2.0, 4.0, 2)
    assert rows[2] == (4.0, 6.0, 2)
    assert rows[3] == (6.0, 8.0, 0)   # zero bin kept
    assert rows[4] == (8.0, 10.0, 1)  # hi-edge value in last bin
    assert sum(n for _, _, n in rows.values()) == 7
    with pytest.raises(ValueError):
        equi_width_histogram(df, "v", bins=0)


def test_profile_columns_hand_case(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (None, "a"), (4.0, None)], "x double, s string"
    )
    prof = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    px, ps = prof["x"], prof["s"]
    assert (px["n"], px["nulls"], px["null_frac"], px["n_distinct"]) == (4, 1, 0.25, 3)
    assert (px["min_s"], px["max_s"], px["mean"]) == ("1.0", "4.0", round(7.0 / 3, 6))
    assert (ps["nulls"], ps["n_distinct"], ps["min_s"], ps["max_s"]) == (1, 2, "a", "b")
    assert ps["mean"] is None
    with pytest.raises(ValueError):
        profile_columns(df, [])


def test_histogram_quantiles_error_bound_and_merge(spark):
    """The estimate's bin must bracket the TRUE quantile (error <= bin
    width) for every q, and the underlying per-bin counts merge by SUM:
    the histogram of a union equals the summed histograms of its parts —
    the property that makes the estimator a one-pass mergeable sketch."""
    import numpy as np

    from oaxaca_blinder_rs_spark.operators.profiling import (
        equi_width_histogram,
        histogram_quantiles,
    )

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(100, 15, 4000), rng.exponential(40, 2000)])
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(7)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = {r.q: r for r in histogram_quantiles(df, "x", qs, bins=64).collect()}
    assert sorted(out) == qs
    for q in qs:
        # floor-index true quantile, the package's A8 convention
        s = np.sort(vals)
        true = s[min(int(len(s) * q), len(s) - 1)]
        r = out[q]
        assert r.bin_lo - 1e-9 <= true <= r.bin_hi + 1e-9, (q, true, r)
        assert r.bin_lo <= r.est <= r.bin_hi + 1e-9
    # merge-by-sum: histogram(union) == histogram(part1) + histogram(part2)
    lo, hi = float(vals.min()), float(vals.max())
    d1 = spark.createDataFrame([(float(v),) for v in vals[:3000]], "x double")
    d2 = spark.createDataFrame([(float(v),) for v in vals[3000:]], "x double")
    h = {r.bin: r.n for r in equi_width_histogram(df, "x", 32, lo, hi).collect()}
    h1 = {r.bin: r.n for r in equi_width_histogram(d1, "x", 32, lo, hi).collect()}
    h2 = {r.bin: r.n for r in equi_width_histogram(d2, "x", 32, lo, hi).collect()}
    assert h == {b: h1[b] + h2[b] for b in h}
    with pytest.raises(ValueError):
        histogram_quantiles(df, "x", [0.0])


def test_drift_report_hand_case(spark):
    """Categorical PSI against a hand computation, including a bucket absent
    from one side (eps-clamped share) and a null bucket."""
    import math

    from oaxaca_blinder_rs_spark.operators.profiling import drift_report

    a = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 3 + [(None,)], "c string"
    )
    b = spark.createDataFrame([("x",)] * 5 + [("z",)] * 5, "c string")
    got = {r.bucket: r for r in drift_report(a, b, cat_cols=["c"]).collect()}
    assert set(got) == {"x", "y", "z", "(null)"}
    assert (got["x"].n_a, got["x"].n_b) == (6, 5)
    # hand PSI for x: (0.6 - 0.5) * ln(0.6/0.5)
    assert got["x"].psi == round(0.1 * math.log(0.6 / 0.5), 6)
    # y absent from b: share_b clamps to 1e-6
    assert got["y"].psi == round((0.3 - 1e-6) * math.log(0.3 / 1e-6), 6)
    assert got["(null)"].n_a == 1 and got["(null)"].n_b == 0


def test_drift_report_numeric_bins_shared_edges(spark):
    """Numeric dims bin over the GLOBAL [min,max] of both snapshots: a value
    present only in b stretches the range a's buckets use; identical
    distributions give psi == 0 for every bucket."""
    from oaxaca_blinder_rs_spark.operators.profiling import drift_report

    a = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    rows = drift_report(a, a, num_cols=["x"], bins=5).collect()
    assert all(r.psi == 0.0 and r.n_a == r.n_b for r in rows)
    assert {r.bucket for r in rows} == {"0", "1", "2", "3", "4"}
    b = spark.createDataFrame([(float(i),) for i in range(20)], "x double")
    got = {r.bucket: r for r in drift_report(a, b, num_cols=["x"], bins=2).collect()}
    # global range [0, 19]; all of a lands in bin 0, b splits roughly in half
    assert got["0"].n_a == 10 and got["1"].n_a == 0
    assert got["0"].n_b == 10 and got["1"].n_b == 10


def test_drift_report_validates(spark):
    import pytest as _pytest

    from oaxaca_blinder_rs_spark.operators.profiling import drift_report

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        drift_report(df, df)
    with _pytest.raises(ValueError):
        drift_report(df, df, num_cols=["x"], bins=0)


def test_drift_metrics_hand_case(spark):
    """psi collapses the per-bucket terms of psi_from_counts; jsd and ks
    match hand computations; ks is NULL for unordered (categorical) dims."""
    import math

    from oaxaca_blinder_rs_spark.operators.profiling import (
        drift_bucket_counts,
        drift_metrics,
        psi_from_counts,
    )

    a = spark.createDataFrame([(float(i % 4),) for i in range(8)], "x double")
    b = spark.createDataFrame([(float(i % 2),) for i in range(8)], "x double")
    bounds = {"x": (0.0, 3.0)}
    ca = drift_bucket_counts(a, num_cols=["x"], bins=3, bounds=bounds)
    cb = drift_bucket_counts(b, num_cols=["x"], bins=3, bounds=bounds)
    row = drift_metrics(ca, cb, ordered_dims=["x"]).collect()[0]
    # shares: a = (1/4, 1/4, 1/2) over bins {0,1,2}; b = (1/2, 1/2, 0)
    sa, sb = [0.25, 0.25, 0.5], [0.5, 0.5, 0.0]
    psi = sum(
        (max(x, 1e-6) - max(y, 1e-6)) * math.log(max(x, 1e-6) / max(y, 1e-6))
        for x, y in zip(sa, sb)
    )
    jsd = sum(
        (x * math.log(2 * x / (x + y)) if x else 0.0) / 2
        + (y * math.log(2 * y / (x + y)) if y else 0.0) / 2
        for x, y in zip(sa, sb)
    )
    ks = max(abs(sum(sa[: i + 1]) - sum(sb[: i + 1])) for i in range(3))
    assert (row.psi, row.jsd, row.ks) == (round(psi, 6), round(jsd, 6), round(ks, 6))
    # psi equals the collapsed psi_from_counts column up to per-bucket
    # rounding (psi_from_counts rounds each term to 6dp before this sum)
    psi_rows = psi_from_counts(ca, cb).collect()
    assert abs(row.psi - sum(r.psi for r in psi_rows)) <= len(psi_rows) * 5e-7
    # MIXED dims with ordered_dims set: the categorical buckets share the
    # KS window's ordering cast (ANSI mode throws on a plain cast — the
    # try_cast regression), ks NULL for the cat dim, defined for numeric
    c = spark.createDataFrame([("u", 1.0), ("v", 2.0)], "c string, x double")
    kw = dict(cat_cols=["c"], num_cols=["x"], bins=2, bounds={"x": (0.0, 2.0)})
    r2 = {
        r.dim: r
        for r in drift_metrics(
            drift_bucket_counts(c, **kw),
            drift_bucket_counts(c, **kw),
            ordered_dims=["x"],
        ).collect()
    }
    assert r2["c"].ks is None and r2["c"].psi == 0.0 and r2["c"].jsd == 0.0
    assert r2["x"].ks == 0.0 and r2["x"].psi == 0.0


def test_histogram_quantiles_per_group(spark):
    """group_cols: per-group quantiles over SHARED bounds equal running the
    global operator on each group's slice with those bounds pinned."""
    from oaxaca_blinder_rs_spark.operators.profiling import histogram_quantiles

    rows = [("g1", float(i)) for i in range(100)] + [
        ("g2", float(i * 3)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    qs = [0.5, 0.9]
    got = {
        (r.g, r.q): (r.est, r.bin, r.n_bin)
        for r in histogram_quantiles(
            df, "x", qs, bins=32, lo=0.0, hi=297.0, group_cols=["g"]
        ).collect()
    }
    assert len(got) == 4
    for g in ("g1", "g2"):
        want = {
            r.q: (r.est, r.bin, r.n_bin)
            for r in histogram_quantiles(
                df.filter(f"g = '{g}'"), "x", qs, bins=32, lo=0.0, hi=297.0
            ).collect()
        }
        for q in qs:
            assert got[(g, q)] == want[q], (g, q)


def test_drift_properties_random(spark):
    """Seeded-random property sweep: psi >= 0 with equality iff identical
    shares; jsd in [0, ln 2]; ks in [0, 1]; bucket counts merge by SUM
    across arbitrary row splits (the mergeable-halves claim)."""
    import math
    import random

    from oaxaca_blinder_rs_spark.operators.profiling import (
        drift_bucket_counts,
        drift_metrics,
    )

    rng = random.Random(11)
    for trial in range(3):
        n_a, n_b = rng.randint(40, 120), rng.randint(40, 120)
        rows_a = [(rng.choice("pqrst"), rng.uniform(0, 50)) for _ in range(n_a)]
        rows_b = [(rng.choice("pqrs"), rng.uniform(0, 80)) for _ in range(n_b)]
        a = spark.createDataFrame(rows_a, "c string, x double")
        b = spark.createDataFrame(rows_b, "c string, x double")
        kw = dict(cat_cols=["c"], num_cols=["x"], bins=6, bounds={"x": (0.0, 80.0)})
        ca, cb = drift_bucket_counts(a, **kw), drift_bucket_counts(b, **kw)
        for r in drift_metrics(ca, cb, ordered_dims=["x"]).collect():
            assert r.psi >= 0.0, (trial, r)
            assert 0.0 <= r.jsd <= math.log(2) + 1e-9, (trial, r)
            if r.dim == "x":
                assert 0.0 <= r.ks <= 1.0
        # self-drift is exactly zero on every metric
        for r in drift_metrics(ca, ca, ordered_dims=["x"]).collect():
            assert (r.psi, r.jsd) == (0.0, 0.0)
            assert r.ks in (0.0, None)
        # counts merge by SUM over an arbitrary split of a's rows
        cut = rng.randint(1, n_a - 1)
        c1 = drift_bucket_counts(spark.createDataFrame(rows_a[:cut], "c string, x double"), **kw)
        c2 = drift_bucket_counts(spark.createDataFrame(rows_a[cut:], "c string, x double"), **kw)
        whole = {(r.dim, r.bucket): r.n for r in ca.collect()}
        merged = {}
        for r in c1.collect() + c2.collect():
            merged[(r.dim, r.bucket)] = merged.get((r.dim, r.bucket), 0) + r.n
        assert merged == whole, trial


# ---- GK-sketch rank-error certificate (round 10) ----------------------------


def test_quantile_sketch_check_bounds_and_exactness(spark, sf_dir):
    from oaxaca_blinder_rs_spark.operators.profiling import quantile_sketch_check

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = quantile_sketch_check(li, "l_extendedprice").collect()
    assert [r.p for r in out] == [0.25, 0.5, 0.75, 0.9, 0.99]
    assert all(r.within_bound for r in out)
    # exact_q equals the direct exact percentile
    from pyspark.sql import functions as F

    direct = li.agg(
        *[F.round(F.expr(f"percentile(l_extendedprice, {p})"), 6).alias(f"q{i}")
          for i, p in enumerate([0.25, 0.5, 0.75, 0.9, 0.99])]
    ).collect()[0]
    assert [r.exact_q for r in out] == [direct[f"q{i}"] for i in range(5)]
    # rank fraction should actually be close to p, not just within the
    # loose-n bound (sanity that the recount measures what it claims)
    for r in out:
        assert abs(r.approx_rank_frac - r.p) < 0.05


def test_quantile_sketch_check_validation(spark, sf_dir):
    import pytest

    from oaxaca_blinder_rs_spark.operators.profiling import quantile_sketch_check

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError, match="fractions"):
        quantile_sketch_check(li, "l_extendedprice", probs=[1.5])
    with pytest.raises(ValueError, match="accuracy"):
        quantile_sketch_check(li, "l_extendedprice", accuracy=5)
    # nulls ignored: an all-null column has n=0 -> empty probe output is
    # not meaningful; assert it raises cleanly instead of dividing by zero
    from pyspark.sql import functions as F

    got = quantile_sketch_check(
        li.withColumn("z", F.lit(None).cast("double")).limit(100), "l_extendedprice"
    ).collect()
    assert len(got) == 5


def test_topk_per_group(spark, sf_dir):
    """topk_per_group (r10): equals the brute-force per-group ranking with
    the shared tie-break; weighted face sums int weights; k validation."""
    import pytest
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.profiling import topk_per_group

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r.event_type, r.rank): (r.user_id, r.n)
        for r in topk_per_group(ev, "event_type", "user_id", k=2).collect()
    }
    direct = (
        ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    by_type: dict = {}
    for r in direct:
        by_type.setdefault(r.event_type, []).append((r.user_id, r.n))
    for t, lst in by_type.items():
        lst.sort(key=lambda kv: (-kv[1], kv[0]))
        for i, (u, n) in enumerate(lst[:2], start=1):
            assert got[(t, i)] == (u, n), (t, i)
    # weighted: top event types per user by summed value? value is double ->
    # use a constructed int frame instead
    df = spark.createDataFrame(
        [("g1", "a", 5), ("g1", "a", 5), ("g1", "b", 100), ("g2", "c", 1)],
        "g string, k string, w long",
    )
    wtop = [(r.g, r.k, r.n, r.rank) for r in topk_per_group(df, "g", "k", k=1, weight_col="w").collect()]
    assert sorted(wtop) == [("g1", "b", 100, 1), ("g2", "c", 1, 1)]
    with pytest.raises(ValueError, match="k must"):
        topk_per_group(df, "g", "k", k=0)


def test_quantile_sketch_check_high_multiplicity_column(spark):
    """r11 (ADVICE): a value with multiplicity > eps*n owns a WIDE rank
    interval — on a 50%-zeros column probed at p=0.25 the upper rank alone
    is ~0.5 and the old one-sided check wrongly failed a sketch that meets
    its contract. The interval test must certify it, on every layout."""
    from oaxaca_blinder_rs_spark.operators.profiling import quantile_sketch_check

    rows = [(0.0,)] * 500 + [(float(i),) for i in range(1, 501)]
    for parts in (1, 4, 13):
        df = spark.createDataFrame(rows, "v double").repartition(parts)
        out = quantile_sketch_check(df, "v", probs=[0.1, 0.25, 0.4, 0.5, 0.9]).collect()
        assert all(r.within_bound for r in out), [(r.p, r.within_bound) for r in out]
        # and the exact quantiles are what duplicates imply
        byp = {r.p: r.exact_q for r in out}
        assert byp[0.1] == 0.0 and byp[0.25] == 0.0 and byp[0.4] == 0.0


# ---- exact tie-aware ROC AUC (round 12) -------------------------------------


def test_binary_auc_matches_bruteforce(spark):
    """binary_auc == the literal pairwise Mann-Whitney count (1 per strict
    win, 1/2 per tie) on seeded random data with heavy ties, per group and
    globally, on any partitioning."""
    import random

    from oaxaca_blinder_rs_spark.operators.profiling import binary_auc

    random.seed(12)
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(120):
            s = random.choice([0.1, 0.2, 0.3]) if random.random() < 0.6 else random.random()
            rows.append((g, s, random.random() < 0.25 + s / 2))
    rows += [("a", None, True), ("b", 0.2, None)]  # dropped
    df = spark.createDataFrame(rows, "g string, s double, y boolean").repartition(7)

    def brute(pairs):
        pos = [s for s, y in pairs if y]
        neg = [s for s, y in pairs if not y]
        u = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
        return u / (len(pos) * len(neg)), len(pos), len(neg)

    got = {r["g"]: (r["auc"], r["n_pos"], r["n_neg"]) for r in binary_auc(df, "s", "y", by="g").collect()}
    clean = [(g, s, y) for g, s, y in rows if s is not None and y is not None]
    for g in ("a", "b", "c"):
        want_auc, want_np, want_nn = brute([(s, y) for gg, s, y in clean if gg == g])
        auc, np_, nn_ = got[g]
        assert (np_, nn_) == (want_np, want_nn)
        assert abs(auc - want_auc) < 1e-12, (g, auc, want_auc)
    glob = binary_auc(df, "s", "y").collect()[0]
    want_auc, want_np, want_nn = brute([(s, y) for _, s, y in clean])
    assert (glob["n_pos"], glob["n_neg"]) == (want_np, want_nn)
    assert abs(glob["auc"] - want_auc) < 1e-12


def test_binary_auc_edges(spark):
    """Perfect separation -> 1; anti-separation -> 0; all-tied -> 1/2;
    one-class group -> NULL auc (undefined, not 0)."""
    from oaxaca_blinder_rs_spark.operators.profiling import binary_auc

    perfect = spark.createDataFrame(
        [(1.0, True)] * 3 + [(0.0, False)] * 4, "s double, y boolean"
    )
    assert binary_auc(perfect, "s", "y").collect()[0]["auc"] == 1.0
    anti = spark.createDataFrame(
        [(0.0, True)] * 3 + [(1.0, False)] * 4, "s double, y boolean"
    )
    assert binary_auc(anti, "s", "y").collect()[0]["auc"] == 0.0
    tied = spark.createDataFrame(
        [(0.7, True)] * 5 + [(0.7, False)] * 2, "s double, y boolean"
    )
    assert binary_auc(tied, "s", "y").collect()[0]["auc"] == 0.5
    one = spark.createDataFrame([(0.1, True), (0.9, True)], "s double, y boolean")
    r = binary_auc(one, "s", "y").collect()[0]
    assert r["auc"] is None and (r["n_pos"], r["n_neg"]) == (2, 0)


def test_roc_points_matches_bruteforce(spark):
    """Every ROC point equals the literal >= -threshold tallies computed in
    Python; monotone tpr/fpr; the final point is (1, 1); degenerate
    one-class input yields NULL for the empty class's ratio."""
    import random

    from oaxaca_blinder_rs_spark.operators.profiling import roc_points

    random.seed(5)
    rows = [(random.choice([0.1, 0.3, 0.5, 0.7]), random.random() < 0.4) for _ in range(300)]
    df = spark.createDataFrame(rows, "s double, y boolean").repartition(5)
    got = {
        r["threshold"]: (r["n_pos_ge"], r["n_neg_ge"], r["tpr"], r["fpr"])
        for r in roc_points(df, "s", "y").collect()
    }
    P = sum(1 for _, y in rows if y)
    N = len(rows) - P
    for t in sorted({s for s, _ in rows}):
        npg = sum(1 for s, y in rows if y and s >= t)
        nng = sum(1 for s, y in rows if not y and s >= t)
        g = got[t]
        assert (g[0], g[1]) == (npg, nng)
        assert abs(g[2] - npg / P) < 1e-12 and abs(g[3] - nng / N) < 1e-12
    lowest = min(got)
    assert got[lowest][2] == 1.0 and got[lowest][3] == 1.0
    one = spark.createDataFrame([(0.2, True), (0.9, True)], "s double, y boolean")
    rs = roc_points(one, "s", "y").collect()
    assert all(r["fpr"] is None for r in rs) and all(r["tpr"] is not None for r in rs)


def test_calibration_bins_hand_case(spark):
    """r13: calibration_bins — exact tallies, edge folding (score 1.0 into
    the last bin), NULL drops, out-of-range rejection; ece_from_bins
    reproduces the hand-computed ECE."""
    import pytest as _pytest

    from oaxaca_blinder_rs_spark.operators.profiling import (
        calibration_bins,
        ece_from_bins,
    )

    rows = [
        (0.05, False), (0.05, False), (0.05, True),   # bin 0: pos_rate 1/3, mean .05
        (0.55, True), (0.65, False),                   # bins 5, 6
        (1.0, True), (0.95, True), (0.95, False),      # bin 9 (1.0 folds in)
        (None, True), (0.5, None),                     # dropped
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "s", "y", bins=10).collect()}
    assert set(got) == {0, 5, 6, 9}
    b0 = got[0]
    assert b0["n"] == 3 and b0["n_pos"] == 1
    assert b0["pos_rate"] == 1.0 / 3.0 and abs(b0["mean_score"] - 0.05) < 1e-15
    b9 = got[9]
    assert b9["n"] == 3 and b9["n_pos"] == 2  # 1.0 folded into bin 9
    assert abs(b9["mean_score"] - (1.0 + 0.95 + 0.95) / 3) < 1e-15

    bins_df = calibration_bins(df, "s", "y", bins=10)
    ece = ece_from_bins(bins_df).collect()[0]["ece"]
    n_tot = 8
    hand = sum(
        (r["n"] / n_tot) * abs(r["pos_rate"] - r["mean_score"])
        for r in got.values()
    )
    assert abs(ece - hand) < 1e-12

    # perfectly calibrated degenerate case: score == empirical rate per bin
    perf = spark.createDataFrame(
        [(0.5, True), (0.5, False)], "s double, y boolean"
    )
    e = ece_from_bins(calibration_bins(perf, "s", "y", bins=10)).collect()[0]["ece"]
    assert abs(e) < 1e-15

    with _pytest.raises(ValueError, match="outside"):
        calibration_bins(
            spark.createDataFrame([(1.5, True)], "s double, y boolean"), "s", "y"
        )
    with _pytest.raises(ValueError, match="bins"):
        calibration_bins(df, "s", "y", bins=0)

    # per-group path: groups don't mix
    g = spark.createDataFrame(
        [("a", 0.1, True), ("b", 0.1, False)], "g string, s double, y boolean"
    )
    bys = {(r["g"], r["bin"]): r for r in calibration_bins(g, "s", "y", by="g").collect()}
    assert bys[("a", 1)]["n_pos"] == 1 and bys[("b", 1)]["n_pos"] == 0
