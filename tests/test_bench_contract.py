"""bench.py contract-line hygiene: the `suspect` field must flag
contention-polluted samples (r7 verdict item 6) without touching Spark."""

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
bench_mod = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("bench_mod", bench_mod)
_SPEC.loader.exec_module(bench_mod)

suspect_queries = bench_mod.suspect_queries


def test_clean_run_has_no_suspects():
    samples = {
        "calibration_pre": [0.3, 0.31],
        "mean_reps100": [1.2, 1.1, 1.15],
        "matching_1nn": [1.5, 1.4, 1.45],
    }
    assert suspect_queries(samples, cal_ratio=0.8) == []


def test_spread_over_3x_is_flagged_when_calibration_clean():
    # r6-style cold/warm swing: matching samples [16.2, 9.0, 1.9] (8.5x)
    samples = {
        "calibration_pre": [0.3],
        "matching_1nn": [16.2, 9.0, 1.9],
        "embedding_cov": [0.48, 0.43, 0.39],
    }
    assert suspect_queries(samples, cal_ratio=1.0) == ["matching_1nn"]


def test_dirty_calibration_flags_every_timed_query():
    samples = {
        "calibration_pre": [0.9],
        "mean_reps100": [1.2, 1.1],
        "akm_panel": [1.6, 1.5],
    }
    out = suspect_queries(samples, cal_ratio=2.5)
    assert sorted(out) == ["akm_panel", "mean_reps100"]
    assert "calibration_pre" not in out


def test_sub_50ms_jitter_is_not_load():
    # kernel-scale entries time in hundredths; 0.01 vs 0.09 is timer noise
    samples = {"mean_reps1_100k_kernel": [0.01, 0.09, 0.087]}
    assert suspect_queries(samples, cal_ratio=1.0) == []


def test_single_sample_under_load_is_flagged():
    """r9 (verdict item 3): the r8 failure mode — mm_taubatch recorded one
    32.1 s sample against loadavg 18-23 (idle truth: 13.8 s) and the
    spread rule had nothing to spread against. A lone usable sample whose
    loadavg trail exceeds the limit must self-identify as suspect."""
    samples = {
        "calibration_pre": [0.3],
        "mm_taubatch_s20_b2": [32.143],
        "embedding_cov": [0.48, 0.43, 0.39],
    }
    loadavg = {
        "calibration_pre": [1.0, 1.0],
        "mm_taubatch_s20_b2": [23.3, 18.56],
        "embedding_cov": [2.0, 2.0, 2.0, 2.0],
    }
    assert suspect_queries(samples, cal_ratio=1.0, loadavg=loadavg) == [
        "mm_taubatch_s20_b2"
    ]


def test_single_sample_on_quiet_box_is_not_flagged():
    samples = {"calibration_pre": [0.3], "mm_taubatch_s20_b2": [13.8]}
    loadavg = {"mm_taubatch_s20_b2": [1.2, 2.5]}
    assert suspect_queries(samples, cal_ratio=1.0, loadavg=loadavg) == []


def test_single_sample_without_loadavg_trail_keeps_old_behavior():
    # loadavg=None (old callers) stays purely spread-based
    samples = {"mm_taubatch_s20_b2": [32.143]}
    assert suspect_queries(samples, cal_ratio=1.0) == []


def test_dirty_np_pre_row_flags_its_mm_entry():
    """r14 (verdict item 2): the BENCH_r13 escape — mm_taubatch_s20_b2
    shipped 17.496 s (same-tree clean run: 14.0 s) unflagged because the
    rule checked only the global JVM calibration and within-entry spread,
    never the entry's OWN np pre-calibration row (0.140 s vs the 0.055 s
    ref = 2.5x dirty). The synthetic set below reproduces that artifact's
    shape; the rule must flag the entry gated by the dirty pre-row and
    leave the clean-pre-row entry alone."""
    samples = {
        "calibration_pre": [0.3, 0.31],
        "calibration_np": [0.055, 0.06],
        "calibration_np_pre_mm_gram": [0.057, 0.058],      # clean (1.04x)
        "mm_gram_s60_b8": [12.332, 12.9],
        "calibration_np_pre_mm_taubatch": [0.140, 0.151],  # 2.5x dirty
        "mm_taubatch_s20_b2": [17.496, 18.2],              # spread 1.04x: old rule blind
    }
    flagged = suspect_queries(samples, cal_ratio=0.865, np_ref=0.055)
    assert flagged == ["mm_taubatch_s20_b2"]


def test_np_pre_row_gate_needs_np_ref():
    # old callers (np_ref omitted) keep the pre-r14 behavior exactly
    samples = {
        "calibration_np_pre_mm_taubatch": [0.140],
        "mm_taubatch_s20_b2": [17.496, 18.2],
    }
    assert suspect_queries(samples, cal_ratio=0.865) == []


def test_np_pre_row_gate_composes_with_spread_rule():
    # an entry can be flagged by spread AND have a dirty pre-row — listed once
    samples = {
        "calibration_np_pre_mm_gram": [0.2],
        "mm_gram_s60_b8": [30.0, 9.0],  # 3.3x spread
        "embedding_cov": [0.4, 0.41],
    }
    flagged = suspect_queries(samples, cal_ratio=1.0, np_ref=0.055)
    assert flagged == ["mm_gram_s60_b8"]


def test_np_calibration_runs_and_is_excluded_from_totals():
    """The numpy-kernel calibration (r9): measurable, fixed-shape, and —
    like every calibration entry — excluded from the suspect rule by the
    'calibration' name prefix."""
    import bench

    dt = bench.bench_calibration_np()
    assert 0.0 < dt < 60.0
    # name-prefix exclusion: a wildly-spread calibration_np entry must not
    # appear in the suspect list
    flagged = bench.suspect_queries(
        {"calibration_np": [0.05, 5.0], "q": [1.0, 1.1]}, 1.0,
        loadavg={"calibration_np": [1.0], "q": [1.0]},
    )
    assert flagged == []


def test_oracle_cache_key_tracks_data_fingerprint(tmp_path):
    """r14 (ADVICE): the oracle cache key must change when the testdata
    under the same path is regenerated — size or mtime movement of any
    parquet file yields a new key, while an untouched tree replays the
    same key."""
    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("check_oracle_mod", m)
    spec.loader.exec_module(m)

    sf = tmp_path / "sf"
    sf.mkdir()
    f = sf / "documents.parquet"
    f.write_bytes(b"AAAA")
    k1 = m._cache_key("SELECT 1", str(sf))
    assert m._cache_key("SELECT 1", str(sf)) == k1     # stable when untouched
    assert m._cache_key("SELECT 2", str(sf)) != k1     # SQL still keyed
    f.write_bytes(b"BBBBBB")                           # regenerated data
    assert m._cache_key("SELECT 1", str(sf)) != k1
    # non-parquet files are not part of the fingerprint
    k2 = m._cache_key("SELECT 1", str(sf))
    (sf / "notes.txt").write_text("x")
    assert m._cache_key("SELECT 1", str(sf)) == k2


# ---- driver-contract registry invariants (round 12) --------------------------


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_mod",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_mod", mod)
    spec.loader.exec_module(mod)
    return mod


def test_registry_oracle_pairing():
    """Every queries() row has an oracle_sql() twin and vice versa — the
    pairing invariant is machine-checked, not prose-tracked (r11 verdict
    item 8; zero rows-only exceptions since pca_whiten_top2 retired)."""
    e = _entry_mod()
    qs, oracles = set(e.queries()), set(e.oracle_sql())
    assert qs == oracles, (sorted(qs - oracles), sorted(oracles - qs))


def test_pca_whiten_top2_rows_only(spark, sf_dir):
    """The retired driver row, pinned as a suite check (r11 verdict item 2):
    the d=64 top-2 whitening runs on the driver embeddings table with a
    stable schema and one row per vector. Its VALUES stay covered by
    ⊕pca_whiten_2d (same code path, closed-form oracle),
    ⊕pca_whiten_invariants, ⊕embedding_cov_check and the NumPy-parity
    tests — the eigensolve itself is the documented SQL-inexpressible
    bound (COVERAGE.md)."""
    e = _entry_mod()
    out = e.q_pca_whiten_top2(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == ["vec_id", "w0", "w1"]
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = out.collect()
    assert len(rows) == n
    assert all(r.w0 is not None and r.w1 is not None for r in rows)


def test_bench_abab_adjudication_logic():
    """r13: tools/bench_abab.py — the machine-readable ABAB protocol. Pure
    adjudication logic: per-entry best-of over CLEAN runs only; entries with
    no clean pair refuse a verdict instead of reporting a host phase as a
    regression (the r11 mean_reps100 / r12 mm_gram false-alarm class)."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench_abab",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "bench_abab.py"),
    )
    m = _ilu.module_from_spec(spec)
    spec.loader.exec_module(m)

    def mk(clean_jvm, clean_np, queries):
        return {"calibration": {"ratio_vs_ref": clean_jvm, "np_ratio_vs_ref": clean_np},
                "queries": queries}

    ok, why = m.is_clean(mk(0.85, 0.9, {}))
    assert ok and why == "clean"
    ok, why = m.is_clean(mk(2.4, 0.9, {}))          # JVM host phase
    assert not ok and "jvm" in why
    ok, why = m.is_clean(mk(0.85, 4.0, {}))         # BLAS-bandwidth phase
    assert not ok and "np" in why
    ok, why = m.is_clean({"queries": {}})           # no calibration at all
    assert not ok

    runs_a = [
        {"iter": 0, "clean": True, "bench": mk(0.8, 0.9, {"q1": 2.0, "q2": 5.0})},
        {"iter": 1, "clean": False, "bench": mk(2.5, 0.9, {"q1": 0.1, "q2": 0.1})},
    ]
    runs_b = [
        {"iter": 0, "clean": True, "bench": mk(0.8, 0.9, {"q1": 1.0, "q3": 7.0})},
        {"iter": 1, "clean": True, "bench": mk(0.8, 0.9, {"q1": 1.5, "q3": 6.0})},
    ]
    entries, unadj = m.adjudicate(runs_a, runs_b)
    # q1: both sides clean — best-of compares 2.0 vs min(1.0, 1.5)
    assert entries["q1"]["a_best"] == 2.0 and entries["q1"]["b_best"] == 1.0
    assert entries["q1"]["b_over_a"] == 0.5
    # the DIRTY A run's implausibly-fast 0.1 samples were never consulted
    assert entries["q1"]["a_clean_samples"] == [2.0]
    # q2 (A-only) and q3 (B-only): no clean pair -> explicit refusal
    assert set(unadj) == {"q2", "q3"}
    assert entries["q2"]["verdict"] == "NO CLEAN PAIR"
    # calibration rows never appear as entries
    assert not any(k.startswith("calibration") for k in entries)
