"""Juhn-Murphy-Pierce decomposition of changes over time (SURVEY M15).

Reference: /root/reference/oaxaca_blinder/src/jmp.rs:44-106. Pure driver
arithmetic over two Oaxaca runs (any scale — the runs are the Spark work).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class JmpDecomposition:
    """jmp.rs:6-15."""

    total_change: float
    quantity_effect: float
    price_effect: float
    gap_effect: float

    def summary(self) -> str:
        out = "\n".join(
            [
                "Juhn-Murphy-Pierce (JMP) Decomposition of Changes",
                "==================================================",
                f"Total Change in Gap: {self.total_change:.4f}",
                f"  Quantity Effect:   {self.quantity_effect:.4f}",
                f"  Price Effect:      {self.price_effect:.4f}",
                f"  Gap Effect:        {self.gap_effect:.4f}",
            ]
        )
        print(out)
        return out


def decompose_changes(builder_t1, builder_t2) -> JmpDecomposition:
    """jmp.rs:44-106: quantity = (dx2-dx1)'beta*_1; price = d(explained) -
    quantity; gap = d(unexplained)."""
    r1 = builder_t1.run()
    r2 = builder_t2.run()

    total_change = r2.total_gap - r1.total_gap
    dx1 = np.asarray(r1.xa_mean) - np.asarray(r1.xb_mean)
    dx2 = np.asarray(r2.xa_mean) - np.asarray(r2.xb_mean)
    quantity_effect = float((dx2 - dx1) @ np.asarray(r1.beta_star))
    explained_change = r2.two_fold.explained.estimate - r1.two_fold.explained.estimate
    price_effect = explained_change - quantity_effect
    gap_effect = r2.two_fold.unexplained.estimate - r1.two_fold.unexplained.estimate
    return JmpDecomposition(
        total_change=total_change,
        quantity_effect=quantity_effect,
        price_effect=price_effect,
        gap_effect=gap_effect,
    )
