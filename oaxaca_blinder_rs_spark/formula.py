"""R-style formula parser (SURVEY F7).

Mirrors /root/reference/oaxaca_blinder/src/formula.rs:12-61: grammar is
``outcome ~ term + term + ...`` where a term wrapped in ``C(...)`` or
``factor(...)`` is categorical; everything else is a continuous predictor.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import InvalidGroupVariable, OaxacaError


@dataclass
class Formula:
    outcome: str
    predictors: list[str] = field(default_factory=list)
    categorical_predictors: list[str] = field(default_factory=list)

    @classmethod
    def parse(cls, formula: str) -> "Formula":
        if "~" not in formula:
            raise OaxacaError(f"Invalid formula (missing '~'): {formula}")
        lhs, rhs = formula.split("~", 1)
        outcome = lhs.strip()
        if not outcome:
            raise OaxacaError(f"Invalid formula (empty outcome): {formula}")
        predictors: list[str] = []
        categoricals: list[str] = []
        for raw in rhs.split("+"):
            term = raw.strip()
            if not term:
                continue
            lowered = term.lower()
            for marker in ("c(", "factor("):
                if lowered.startswith(marker) and term.endswith(")"):
                    inner = term[len(marker): -1].strip()
                    if not inner:
                        raise OaxacaError(f"Invalid categorical term: {term}")
                    categoricals.append(inner)
                    break
            else:
                predictors.append(term)
        if not predictors and not categoricals:
            # formula.rs:49-53 parity (tests/formula_test.rs): an RHS with
            # no usable terms is an error, not an intercept-only model
            raise InvalidGroupVariable("No predictors specified")
        return cls(outcome=outcome, predictors=predictors, categorical_predictors=categoricals)
