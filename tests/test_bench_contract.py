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
