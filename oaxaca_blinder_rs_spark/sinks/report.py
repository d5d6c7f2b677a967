"""HTML report sink (SURVEY K5), mirroring the reference's Askama template
render (main.rs:320-370, templates/report.html) with stdlib string
formatting (no Jinja2 dependency required)."""

from __future__ import annotations

import html

from ..results import OaxacaResults

_PAGE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Oaxaca-Blinder Decomposition Report</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; color: #1a1a2e; }}
h1 {{ border-bottom: 2px solid #334; padding-bottom: .3rem; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
th, td {{ border: 1px solid #aab; padding: .35rem .7rem; text-align: right; }}
th {{ background: #eef; }}
td:first-child, th:first-child {{ text-align: left; }}
.meta {{ color: #556; }}
</style>
</head>
<body>
<h1>Oaxaca-Blinder Decomposition Report</h1>
<p class="meta">Group A (advantaged): {n_a} observations &middot;
Group B (reference): {n_b} observations &middot;
Total gap: <b>{total_gap:.4f}</b></p>
<h2>Two-Fold Decomposition</h2>
{two_fold}
<h2>Detailed Decomposition (Explained)</h2>
{explained}
<h2>Detailed Decomposition (Unexplained)</h2>
{unexplained}
<p class="meta">{interpretation}</p>
</body>
</html>
"""


def _table(components) -> str:
    head = "<tr><th>Component</th><th>Estimate</th><th>Std. Err.</th><th>p-value</th><th>95% CI</th></tr>"
    rows = "".join(
        f"<tr><td>{html.escape(c.name)}</td><td>{c.estimate:.4f}</td>"
        f"<td>{c.std_err:.4f}</td><td>{c.p_value:.4f}</td>"
        f"<td>[{c.ci_lower:.3f}, {c.ci_upper:.3f}]</td></tr>"
        for c in components
    )
    return f"<table>{head}{rows}</table>"


def to_html(results: OaxacaResults) -> str:
    return _PAGE.format(
        n_a=results.n_a,
        n_b=results.n_b,
        total_gap=results.total_gap,
        two_fold=_table(results.two_fold.aggregate),
        explained=_table(results.two_fold.detailed_explained),
        unexplained=_table(results.two_fold.detailed_unexplained),
        interpretation=html.escape(results.interpret()),
    )


def write_html(results: OaxacaResults, path: str) -> None:
    with open(path, "w") as f:
        f.write(to_html(results))
