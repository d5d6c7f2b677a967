"""AKM tests mirroring tests/test_akm.rs (FIXTURES.md F4): parameter
recovery (beta within 0.05 of 2.5, R^2 > 0.99) and connected-set filtering."""

import numpy as np
import pytest

from oaxaca_blinder_rs_spark.operators.akm import AkmBuilder


def akm_fixture(spark, n=1000, n_workers=100, n_firms=20, seed=42):
    rng = np.random.default_rng(seed)
    alpha = rng.uniform(-1, 1, n_workers)
    psi = rng.uniform(-0.5, 0.5, n_firms)
    rows = []
    for _ in range(n):
        w = rng.integers(0, n_workers)
        f = rng.integers(0, n_firms)
        x = rng.uniform(0, 10)
        eps = rng.uniform(-0.01, 0.01)
        y = 2.5 * x + alpha[w] + psi[f] + eps
        rows.append((f"w{w}", f"f{f}", float(x), float(y)))
    return spark.createDataFrame(rows, "worker string, firm string, x double, y double")


def test_akm_parameter_recovery(spark):
    """test_akm.rs:6-75: beta within 0.05 of 2.5; R2 > 0.99."""
    df = akm_fixture(spark)
    res = AkmBuilder(df, "y", "worker", "firm").controls(["x"]).run()
    assert abs(res.beta[0] - 2.5) < 0.05
    assert res.r2 > 0.99
    assert res.worker_effects.count() == 100
    assert res.firm_effects.count() == 20
    # identification: first firm's effect is exactly 0
    f0 = res.firm_effects.orderBy("firm").limit(1).collect()[0]
    assert f0["effect"] == 0.0


def test_akm_disconnected_dropped(spark):
    """test_akm.rs:78-109: disconnected worker w3 (only at firm f2) dropped."""
    rows = [
        ("w1", "f1", 10.0),
        ("w2", "f1", 11.0),
        ("w3", "f2", 12.0),  # disconnected island {w3, f2}
    ]
    df = spark.createDataFrame(rows, "worker string, firm string, y double")
    res = AkmBuilder(df, "y", "worker", "firm").run()
    workers = {r[0] for r in res.worker_effects.collect()}
    assert workers == {"w1", "w2"}


def test_akm_no_controls(spark):
    df = akm_fixture(spark, n=400, n_workers=30, n_firms=8)
    res = AkmBuilder(df, "y", "worker", "firm").run()
    assert res.beta.shape == (0,)
    assert res.worker_effects.count() == 30


def test_akm_dist_engine_matches_pandas(spark):
    """The distributed join-based engine reproduces the driver algorithm."""
    df = akm_fixture(spark, n=300, n_workers=25, n_firms=6, seed=7)
    rp = AkmBuilder(df, "y", "worker", "firm").controls(["x"]).engine("pandas").run()
    rd = AkmBuilder(df, "y", "worker", "firm").controls(["x"]).engine("dist").run()
    assert abs(rp.beta[0] - rd.beta[0]) < 1e-6
    assert abs(rp.r2 - rd.r2) < 1e-8
    wp = {r[0]: r[1] for r in rp.worker_effects.collect()}
    wd = {r[0]: r[1] for r in rd.worker_effects.collect()}
    diffs = [abs(wp[k] - wd[k]) for k in wp]
    assert max(diffs) < 1e-6


def test_akm_dist_label_propagation_drops_island(spark):
    """Distributed label propagation finds the same largest component."""
    rows = [
        ("w1", "f1", 10.0),
        ("w2", "f1", 11.0),
        ("w3", "f2", 12.0),
    ]
    df = spark.createDataFrame(rows, "worker string, firm string, y double")
    res = AkmBuilder(df, "y", "worker", "firm").engine("dist").run()
    workers = {r[0] for r in res.worker_effects.collect()}
    assert workers == {"w1", "w2"}
