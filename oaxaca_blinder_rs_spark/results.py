"""Result model: typed driver-side structs mirroring the reference.

Reference: /root/reference/oaxaca_blinder/src/types.rs:24-180 and display.rs.
Results are k-sized — they live on the driver; only the residual column stays
distributed (exposed as a DataFrame for scale, collected lazily on demand).
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field


@dataclass
class ComponentResult:
    """types.rs:172-180."""

    name: str
    estimate: float
    std_err: float = math.nan
    t_stat: float = math.nan
    p_value: float = math.nan
    ci_lower: float = math.nan
    ci_upper: float = math.nan


@dataclass
class TwoFoldResults:
    """types.rs:49-62."""

    aggregate: list[ComponentResult]
    detailed_explained: list[ComponentResult]
    detailed_unexplained: list[ComponentResult]
    detailed_selection: list[ComponentResult] = field(default_factory=list)

    def _find(self, comps, name):
        for c in comps:
            if c.name == name:
                return c
        return None

    @property
    def explained(self) -> ComponentResult:
        return self._find(self.aggregate, "explained")

    @property
    def unexplained(self) -> ComponentResult:
        return self._find(self.aggregate, "unexplained")


@dataclass
class DecompositionDetail:
    aggregate: list[ComponentResult]
    detailed: list[ComponentResult] = field(default_factory=list)


@dataclass
class BudgetAdjustment:
    """types.rs:44-53: row addressed by index (here: stable row_id)."""

    index: int
    original_residual: float
    adjustment: float


@dataclass
class OaxacaResults:
    """types.rs:24-47; `residuals` are group-B residuals (builder.rs:938)."""

    total_gap: float
    two_fold: TwoFoldResults
    three_fold: DecompositionDetail
    n_a: int
    n_b: int
    residuals: list[float]
    xa_mean: list[float]
    xb_mean: list[float]
    beta_star: list[float]
    predictor_names: list[str] = field(default_factory=list)
    # row_id (stable id) parallel to residuals, Spark-specific addition so
    # adjustments address durable ids rather than positions (SURVEY §7.5 r1).
    residual_row_ids: list[int] = field(default_factory=list)

    # -- lazy distributed residuals (Spark-specific scale design) -------------
    def attach_residuals(self, residuals_df, supplier) -> None:
        """Wire the distributed residual frame + a guarded collect thunk.

        ``residuals_df`` is a DataFrame(row_id, residual) — or a zero-arg
        factory returning one: the builder passes a factory so the plan's
        py4j construction cost (~0.15 s of driver chatter) is paid only when
        residuals are actually requested, not on every fit. It never touches
        the driver unless `ensure_residuals()` is called (and n_b is small).
        """
        object.__setattr__(self, "_residuals_df_src", residuals_df)
        object.__setattr__(self, "_residual_supplier", supplier)

    @property
    def residuals_df(self):
        src = getattr(self, "_residuals_df_src", None)
        if callable(src):
            src = src()
            object.__setattr__(self, "_residuals_df_src", src)
        return src

    def ensure_residuals(self) -> None:
        if not self.residuals and getattr(self, "_residual_supplier", None) is not None:
            ids, vals = self._residual_supplier()
            self.residual_row_ids[:] = ids
            self.residuals[:] = vals

    # -- M18: budget optimizer (types.rs:98-156) ------------------------------
    def optimize_budget(self, budget: float, target_gap: float) -> list[BudgetAdjustment]:
        current_gap = self.total_gap
        if current_gap <= target_gap:
            return []
        self.ensure_residuals()
        required_reduction = current_gap - target_gap
        total_needed = required_reduction * float(self.n_b)
        effective_budget = min(budget, total_needed)
        candidates = [
            (i, r) for i, r in enumerate(self.residuals) if r < 0.0
        ]
        candidates.sort(key=lambda t: t[1])
        adjustments: list[BudgetAdjustment] = []
        spent = 0.0
        for index, residual in candidates:
            if spent >= effective_budget:
                break
            max_raise = -residual
            remaining = effective_budget - spent
            raise_amt = max_raise if max_raise <= remaining else remaining
            if raise_amt > 1e-9:
                row_id = self.residual_row_ids[index] if self.residual_row_ids else index
                adjustments.append(
                    BudgetAdjustment(index=row_id, original_residual=residual, adjustment=raise_amt)
                )
                spent += raise_amt
        return adjustments

    # -- K1: console sink (display.rs:7-80) -----------------------------------
    def summary(self) -> str:
        lines = [
            "Oaxaca-Blinder Decomposition Results",
            "========================================",
            f"Group A (Advantaged): {self.n_a} observations",
            f"Group B (Reference):  {self.n_b} observations",
            f"Total Gap: {self.total_gap:.4f}",
            "",
            "Two-Fold Decomposition",
            _table(self.two_fold.aggregate, "Component"),
            "",
            "Detailed Decomposition (Explained)",
            _table(self.two_fold.detailed_explained, "Variable"),
            "",
            "Detailed Decomposition (Unexplained)",
            _table(self.two_fold.detailed_unexplained, "Variable"),
        ]
        if self.two_fold.detailed_selection:
            lines += ["", "Detailed Decomposition (Selection)",
                      _table(self.two_fold.detailed_selection, "Variable")]
        out = "\n".join(lines)
        print(out)
        return out

    # -- K2: JSON sink (display.rs:134-138) -----------------------------------
    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, default=_json_default)

    # -- K3: Markdown sink (display.rs:113-132) -------------------------------
    def to_markdown(self) -> str:
        md = "### Oaxaca-Blinder Decomposition Results\n\n"
        md += "| Component | Estimate | Std. Err. | p-value | 95% CI |\n"
        md += "|---|---|---|---|---|\n"
        for c in self.two_fold.aggregate:
            md += (
                f"| {c.name} | {c.estimate:.4f} | {c.std_err:.4f} | {c.p_value:.4f} "
                f"| [{c.ci_lower:.3f}, {c.ci_upper:.3f}] |\n"
            )
        return md

    # -- K4: LaTeX sink (display.rs:83-111) -----------------------------------
    def to_latex(self) -> str:
        out = [
            "\\begin{table}[ht]",
            "\\centering",
            "\\begin{tabular}{lcccc}",
            "\\hline",
            "Component & Estimate & Std. Err. & p-value & 95\\% CI \\\\",
            "\\hline",
            "\\multicolumn{5}{l}{\\textit{Two-Fold Decomposition}} \\\\",
        ]
        for c in self.two_fold.aggregate:
            out.append(
                f"{c.name} & {c.estimate:.4f} & {c.std_err:.4f} & {c.p_value:.4f} "
                f"& [{c.ci_lower:.3f}, {c.ci_upper:.3f}] \\\\"
            )
        out += [
            "\\hline",
            "\\end{tabular}",
            "\\caption{Oaxaca-Blinder Decomposition Results}",
            "\\label{tab:oaxaca_results}",
            "\\end{table}",
        ]
        return "\n".join(out) + "\n"

    # -- python.rs:126-158 plot(kind) ------------------------------------------
    def plot_data(self, kind: str = "two_fold") -> dict:
        """Chart-ready data for the python binding's plot(kind) surface.

        The container ships no matplotlib, so this returns the exact series a
        plotting frontend needs; `plot()` renders if matplotlib is available.
        """
        if kind == "two_fold":
            comps = self.two_fold.aggregate
        elif kind == "detailed_explained":
            comps = self.two_fold.detailed_explained
        elif kind == "detailed_unexplained":
            comps = self.two_fold.detailed_unexplained
        elif kind == "three_fold":
            comps = self.three_fold.aggregate
        else:
            raise ValueError(f"unknown plot kind: {kind}")
        return {
            "labels": [c.name for c in comps],
            "estimates": [c.estimate for c in comps],
            "ci_lower": [c.ci_lower for c in comps],
            "ci_upper": [c.ci_upper for c in comps],
        }

    def plot(self, kind: str = "two_fold"):
        data = self.plot_data(kind)
        try:
            import matplotlib.pyplot as plt  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "matplotlib is not installed in this environment; use "
                "plot_data(kind) to retrieve the chart series"
            ) from e
        fig, ax = plt.subplots()
        x = range(len(data["labels"]))
        err = [
            [e - lo for e, lo in zip(data["estimates"], data["ci_lower"])],
            [hi - e for e, hi in zip(data["estimates"], data["ci_upper"])],
        ]
        ax.bar(x, data["estimates"], yerr=err, capsize=4)
        ax.set_xticks(list(x))
        ax.set_xticklabels(data["labels"], rotation=30, ha="right")
        ax.set_title(f"Oaxaca-Blinder decomposition ({kind})")
        return fig

    # -- python.rs:159-186 interpret() ---------------------------------------
    def interpret(self) -> str:
        exp = self.two_fold.explained
        unexp = self.two_fold.unexplained
        pct = lambda v: (v / self.total_gap * 100.0) if self.total_gap else math.nan
        return (
            f"The total gap between Group A and Group B is {self.total_gap:.4f}. "
            f"Of this, {exp.estimate:.4f} ({pct(exp.estimate):.1f}%) is explained by "
            f"differences in observable characteristics, while {unexp.estimate:.4f} "
            f"({pct(unexp.estimate):.1f}%) remains unexplained (attributable to "
            f"differences in returns to those characteristics)."
        )


def _table(components: list[ComponentResult], label: str) -> str:
    header = [label, "Estimate", "Std. Err.", "p-value", "95% CI"]
    rows = [
        [
            c.name,
            f"{c.estimate:.4f}",
            f"{c.std_err:.4f}",
            f"{c.p_value:.4f}",
            f"[{c.ci_lower:.3f}, {c.ci_upper:.3f}]",
        ]
        for c in components
    ]
    widths = [max(len(header[i]), *(len(r[i]) for r in rows)) if rows else len(header[i]) for i in range(5)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "| " + " | ".join(h.ljust(w) for h, w in zip(header, widths)) + " |", sep]
    for r in rows:
        out.append("| " + " | ".join(v.ljust(w) for v, w in zip(r, widths)) + " |")
    out.append(sep)
    return "\n".join(out)


def _json_default(o):
    if isinstance(o, float) and (math.isnan(o) or math.isinf(o)):
        return None
    raise TypeError(f"not JSON serializable: {type(o)}")
