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
