"""Heckman two-step selection correction (SURVEY M12) — implemented in a
later milestone; see heckman.rs:38-108 and estimation.rs:114-269."""

from __future__ import annotations


def run_heckman_oaxaca(builder):
    raise NotImplementedError("Heckman estimator lands in milestone 4 (SURVEY §7.3)")
