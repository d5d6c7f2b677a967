"""Decision-layer tests mirroring engine/src/analysis.rs:1155-1443 behaviors:
mock-data decomposition, optimizer allocation, auto-budget, equitable
pro-rata, verify, frontier monotonicity, strict-cast errors."""

import math

import numpy as np
import pytest

from oaxaca_blinder_rs_spark.errors import NonNumericData
from oaxaca_blinder_rs_spark.operators import engine_ops as eo


def mock_df(spark):
    """analysis.rs:1159-1172-style: 20 copies of an 8-row block."""
    block = [
        (50000.0, 16.0, 10.0, "M", "Eng"),
        (52000.0, 16.0, 12.0, "M", "Eng"),
        (48000.0, 16.0, 8.0, "M", "Sales"),
        (51000.0, 18.0, 10.0, "M", "Eng"),
        (45000.0, 16.0, 10.0, "F", "Eng"),
        (46000.0, 16.0, 12.0, "F", "Eng"),
        (43000.0, 16.0, 8.0, "F", "Sales"),
        (45500.0, 18.0, 10.0, "F", "Eng"),
    ]
    rows = []
    for rep in range(20):
        for j, r in enumerate(block):
            rows.append((rep * 8 + j,) + r)
    return spark.createDataFrame(
        rows, "rid long, wage double, education double, experience double, gender string, department string"
    )


def test_run_decomposition_summary(spark):
    df = mock_df(spark)
    res = eo.run_decomposition(
        df, "wage", "gender", "M", ["education", "experience"], bootstrap_reps=10
    )
    s = res.data_summary
    assert s.total_count == 160
    assert s.group_a_count == 80 and s.group_b_count == 80  # A = reference (M)
    assert s.group_a_mean > s.group_b_mean
    # library gap convention: mean(non-ref F) - mean(ref M) < 0
    assert res.total_gap < 0
    assert abs(res.explained_gap + res.unexplained_gap - res.total_gap) < 1e-9


def test_optimize_auto_budget_closes_gaps(spark):
    """budget=0 => auto budget = total_need * 1.00001; every underpaid
    target-group row raised to its fair wage (analysis.rs:697-703)."""
    df = mock_df(spark)
    res = eo.optimize(df, "wage", "gender", "M", ["education", "experience"], id_col="rid")
    assert res.required_budget > 0
    assert abs(res.total_cost - res.required_budget) < 1e-6
    # every adjustment covers the full diff
    for a in res.adjustments:
        assert a.adjustment >= 0
        assert a.new_wage <= a.fair_wage_upper_bound + 1e-6
    # unexplained gap closes (convention: -net/n)
    assert abs(res.new_unexplained_gap) < abs(res.original_unexplained_gap) + 1e-9
    # new_gap moves toward zero from below
    assert res.new_gap > res.original_gap


def test_optimize_budget_limited_greedy(spark):
    df = mock_df(spark)
    full = eo.optimize(df, "wage", "gender", "M", ["education", "experience"], id_col="rid")
    half_budget = full.required_budget / 2.0
    res = eo.optimize(
        df, "wage", "gender", "M", ["education", "experience"], budget=half_budget, id_col="rid"
    )
    assert abs(res.total_cost - half_budget) < 1e-6
    # greedy: largest diffs paid first - the paid set's diffs dominate unpaid
    paid = [a for a in res.adjustments if a.adjustment > 1e-9]
    assert paid, "should pay someone"


def test_optimize_equitable_pro_rata(spark):
    df = mock_df(spark)
    full = eo.optimize(df, "wage", "gender", "M", ["education", "experience"], id_col="rid")
    res = eo.optimize(
        df, "wage", "gender", "M", ["education", "experience"],
        budget=full.required_budget / 2.0, strategy="equitable", id_col="rid",
    )
    # each eligible row gets ~coverage * diff; cost == budget * (1/1.0)
    assert abs(res.total_cost - full.required_budget / 2.0) < 1.0
    ratios = [
        a.adjustment / (a.fair_wage - a.current_wage)
        for a in res.adjustments
        if a.fair_wage - a.current_wage > 1e-6 and a.adjustment > 0
    ]
    assert ratios and max(ratios) - min(ratios) < 1e-6  # same coverage ratio


def test_optimize_forensic_includes_ineligible(spark):
    df = mock_df(spark)
    res = eo.optimize(
        df, "wage", "gender", "M", ["education", "experience"],
        forensic_mode=True, adjust_both_groups=False, id_col="rid",
    )
    zero_pay = [a for a in res.adjustments if a.adjustment == 0.0]
    assert zero_pay, "forensic mode includes ineligible rows with pay 0"


def test_verify_adjustments_shrinks_gap(spark):
    df = mock_df(spark)
    opt = eo.optimize(df, "wage", "gender", "M", ["education", "experience"], id_col="rid")
    before = eo.run_decomposition(df, "wage", "gender", "M", ["education", "experience"], bootstrap_reps=0)
    after = eo.verify_adjustments(
        df, [(a.index, a.adjustment) for a in opt.adjustments],
        "wage", "gender", "M", ["education", "experience"], bootstrap_reps=0, id_col="rid",
    )
    assert abs(after.total_gap) < abs(before.total_gap)


def test_frontier_monotone_t(spark):
    """engine tests: |t| of the group dummy shrinks as budget grows."""
    df = mock_df(spark)
    pts = eo.efficient_frontier(
        df, "wage", "gender", "M", ["education", "experience"], steps=10, id_col="rid"
    )
    assert len(pts) == 11
    assert pts[0].budget == 0.0
    abs_t = [abs(p.t_statistic) for p in pts]
    assert abs_t[0] > abs_t[-1]
    assert pts[0].is_significant  # big gap at zero budget
    # budgets strictly increasing
    budgets = [p.budget for p in pts]
    assert budgets == sorted(budgets)


def test_strict_cast_error(spark):
    rows = [(1, "50000", "16", "M"), (2, "oops", "16", "F"), (3, "52000", "18", "M"), (4, "41000", "12", "F")]
    df = spark.createDataFrame(rows, "rid long, wage string, education string, gender string")
    with pytest.raises(NonNumericData, match="wage"):
        eo.run_decomposition(df, "wage", "gender", "M", ["education"], bootstrap_reps=0)


def test_defensibility(spark):
    df = mock_df(spark)
    opt = eo.optimize(df, "wage", "gender", "M", ["education", "experience"], id_col="rid")
    adj = [(a.index, a.adjustment) for a in opt.adjustments][:10]
    out = eo.check_defensibility(
        df, adj, "wage", "gender", "M", ["education", "experience"], id_col="rid"
    ).collect()
    assert len(out) == 10
    # raising toward the fair wage is defensible
    assert all(r["is_defensible"] for r in out)
    # a massive negative adjustment is not
    out2 = eo.check_defensibility(
        df, [(adj[0][0], -40000.0)], "wage", "gender", "M", ["education", "experience"], id_col="rid"
    ).collect()[0]
    assert not out2["is_defensible"]
    assert "below the fair-wage lower bound" in out2["defensibility_message"]


def test_ordered_prev_cumsum_matches_global_window(spark):
    """The distributed prefix sum must equal a driver-side sequential scan
    under the same ordering (ties broken by id) and keep the plan free of a
    SinglePartition exchange."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.scan import ordered_prev_cumsum

    rng = np.random.default_rng(11)
    vals = np.round(rng.exponential(5.0, 4000), 1)  # ties
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    ).repartition(16)
    out = ordered_prev_cumsum(df, [F.col("v").desc(), F.col("id").asc()], F.col("v"), "cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    got = {r["id"]: r["cum"] for r in out.collect()}
    order = sorted(range(len(vals)), key=lambda i: (-vals[i], i))
    running = 0.0
    for i in order:
        assert got[i] == pytest.approx(running, rel=1e-12, abs=1e-9)
        running += vals[i]


def test_scan_primitives_randomized(spark):
    """Randomized cross-checks of the distributed-scan primitives against
    sequential references: varying sizes, duplicate-heavy values, and
    partition counts (including 1 and more partitions than rows)."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.scan import grouped_dense_rank, ordered_prev_cumsum

    rng = np.random.default_rng(23)
    for trial in range(4):
        n = int(rng.integers(1, 800))
        nparts = int(rng.choice([1, 4, 16, 64]))
        vals = np.round(rng.normal(0, 3, n), 1)
        groups = rng.choice(["p", "q"], n)
        df = spark.createDataFrame(
            [(i, float(v), str(g)) for i, (v, g) in enumerate(zip(vals, groups))],
            "id long, v double, g string",
        ).repartition(nparts)

        got = {r["id"]: r["cum"] for r in
               ordered_prev_cumsum(df, [F.col("v").asc(), F.col("id").asc()], F.col("v"), "cum").collect()}
        order = sorted(range(n), key=lambda i: (vals[i], i))
        run = 0.0
        for i in order:
            assert got[i] == pytest.approx(run, abs=1e-9), f"trial {trial} id {i}"
            run += vals[i]

        gr = {r["id"]: r["rk"] for r in grouped_dense_rank(df, "g", "id", "rk").collect()}
        for gval in ("p", "q"):
            ids = sorted(i for i in range(n) if groups[i] == gval)
            for rank, i in enumerate(ids):
                assert gr[i] == rank, f"trial {trial} group {gval} id {i}"


def test_grouped_prev_cumsum_matches_per_group_window(spark):
    """grouped_prev_cumsum (r10, the skew-safe source_token_quota path)
    must equal a sequential per-group exclusive scan — including under
    heavy key skew (one group holding ~50% of rows, the one-colossal-domain
    corpus case) — and keep the plan free of both SinglePartition exchanges
    and a plain partitionBy(group) window (the skewed group must SPAN
    range partitions)."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.scan import grouped_prev_cumsum

    rng = np.random.default_rng(17)
    n = 3000
    # ~50% of rows in one group, remainder spread over 40 small groups
    groups = [
        "big" if rng.random() < 0.5 else f"s{int(rng.integers(40))}"
        for _ in range(n)
    ]
    vals = rng.integers(1, 200, n)
    df = spark.createDataFrame(
        [(i, groups[i], int(vals[i])) for i in range(n)],
        "id long, g string, v long",
    ).repartition(16)
    out = grouped_prev_cumsum(df, "g", [F.col("id").asc()], F.col("v"), "cum")
    plan = getattr(out, "_scan_plan", "")
    assert "SinglePartition" not in plan
    got = {r["id"]: r["cum"] for r in out.collect()}
    assert len(got) == n
    running: dict = {}
    for i in range(n):  # ids ascend, so this IS the per-group scan order
        g = groups[i]
        assert got[i] == running.get(g, 0), f"id {i} group {g}"
        running[g] = running.get(g, 0) + int(vals[i])


def test_grouped_prev_cumsum_null_group_and_empty(spark):
    """Null group values accumulate as their own group (eqNullSafe), and an
    empty frame returns a zero column rather than erroring."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.scan import grouped_prev_cumsum

    rows = [(0, "a", 5), (1, None, 7), (2, "a", 3), (3, None, 2)]
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(4)
    got = {
        r["id"]: r["cum"]
        for r in grouped_prev_cumsum(
            df, "g", [F.col("id").asc()], F.col("v"), "cum"
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 5, 3: 7}

    empty = spark.createDataFrame([], "id long, g string, v long")
    out = grouped_prev_cumsum(empty, "g", [F.col("id").asc()], F.col("v"), "cum")
    assert out.count() == 0 and "cum" in out.columns


def test_source_token_quota_null_text_and_skew(spark):
    """source_token_quota: null text counts as empty text (1 whitespace
    token, the split-of-'' engine convention) instead of NULLing the
    running offsets for its source (r9 ADVICE), and a 50%-skewed source
    still produces exact offsets through the grouped scan."""
    from oaxaca_blinder_rs_spark.operators import corpus

    rows = [
        (0, "a", "three token doc"),
        (1, "a", None),
        (2, "a", "two tokens"),
        (3, "b", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["token_offset"], r["keep"])
        for r in corpus.source_token_quota(df, budget_tokens=4).collect()
    }
    # null text -> split('') = [''] -> 1 token, offsets keep flowing
    assert got == {
        0: (3, 0, True),
        1: (1, 3, True),
        2: (2, 4, False),
        3: (1, 0, True),
    }


def test_grouped_dense_rank_null_group(spark):
    """Rows with a null group value must still be ranked (their own group),
    exactly as the legacy per-group window did."""
    from oaxaca_blinder_rs_spark.operators.scan import grouped_dense_rank

    rows = [(0, "a"), (1, None), (2, "a"), (3, None), (4, None)]
    df = spark.createDataFrame(rows, "id long, g string").repartition(4)
    got = {(r["g"], r["id"]): r["rk"] for r in grouped_dense_rank(df, "g", "id", "rk").collect()}
    assert got == {("a", 0): 0, ("a", 2): 1, (None, 1): 0, (None, 3): 1, (None, 4): 2}
