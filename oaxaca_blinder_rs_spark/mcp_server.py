"""MCP server exposing the engine as JSON tools over stdio (SURVEY K6).

Mirrors meridian-mcp (reference meridian-mcp/src/main.rs:516-791): the same
five tools with the same input schemas, JSON-RPC 2.0 over stdin/stdout, and a
per-minute rate limit. Dependency-free (stdlib json only); each tool call
parses the request's CSV bytes into a Spark frame and delegates to
operators/engine_ops.

    python -m oaxaca_blinder_rs_spark.mcp_server
"""

from __future__ import annotations

import json
import math
import sys
import time
from dataclasses import asdict

RATE_LIMIT_PER_MIN = 30

TOOLS = [
    {
        "name": "forensic_decomposition",
        "description": "Perform Oaxaca-Blinder pay equity decomposition.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "csv_content": {"type": "string"},
                "outcome_variable": {"type": "string"},
                "group_variable": {"type": "string"},
                "reference_group": {"type": "string"},
                "predictors": {"type": "array", "items": {"type": "string"}},
                "categorical_predictors": {"type": "array", "items": {"type": "string"}},
                "quantile": {"type": "number"},
                "reference_coefficients": {"type": "string", "enum": ["Pooled", "GroupA", "GroupB", "Weighted"]},
                "bootstrap_reps": {"type": "integer"},
            },
            "required": ["csv_content", "outcome_variable", "group_variable", "reference_group", "predictors"],
        },
    },
    {
        "name": "simulate_remediation",
        "description": "Simulate budget allocation to fix identified pay gaps.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "csv_content": {"type": "string"},
                "outcome_variable": {"type": "string"},
                "group_variable": {"type": "string"},
                "reference_group": {"type": "string"},
                "predictors": {"type": "array", "items": {"type": "string"}},
                "budget": {"type": "number"},
                "target": {"type": "string", "enum": ["Reference", "Pooled"]},
                "strategy": {"type": "string", "enum": ["Greedy", "Equitable"]},
                "range_target": {"type": "string", "enum": ["Midpoint", "LowerBound", "UpperBound"]},
            },
            "required": ["csv_content", "outcome_variable", "group_variable", "reference_group", "predictors", "budget"],
        },
    },
    {
        "name": "verify_adjustments",
        "description": "Validate a set of proposed wage adjustments by re-running the decomposition.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "csv_content": {"type": "string"},
                "outcome_variable": {"type": "string"},
                "group_variable": {"type": "string"},
                "reference_group": {"type": "string"},
                "predictors": {"type": "array", "items": {"type": "string"}},
                "adjustments": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {"index": {"type": "integer"}, "value": {"type": "number"}},
                        "required": ["index", "value"],
                    },
                },
            },
            "required": ["csv_content", "outcome_variable", "group_variable", "reference_group", "predictors", "adjustments"],
        },
    },
    {
        "name": "check_defensibility",
        "description": "Audit specific adjustments for legal/statistical defensibility with predictor overrides.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "csv_content": {"type": "string"},
                "outcome_variable": {"type": "string"},
                "group_variable": {"type": "string"},
                "reference_group": {"type": "string"},
                "predictors": {"type": "array", "items": {"type": "string"}},
                "adjustments": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {
                            "index": {"type": "integer"},
                            "value": {"type": "number"},
                            "predictor_overrides": {"type": "object"},
                        },
                        "required": ["index", "value"],
                    },
                },
            },
            "required": ["csv_content", "outcome_variable", "group_variable", "reference_group", "predictors", "adjustments"],
        },
    },
    {
        "name": "generate_efficient_frontier",
        "description": "Calculate the Efficient Frontier curve (Budget vs Statistical Significance).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "csv_content": {"type": "string"},
                "outcome_variable": {"type": "string"},
                "group_variable": {"type": "string"},
                "reference_group": {"type": "string"},
                "predictors": {"type": "array", "items": {"type": "string"}},
            },
            "required": ["csv_content", "outcome_variable", "group_variable", "reference_group", "predictors"],
        },
    },
]


def _clean_floats(obj):
    if isinstance(obj, float):
        return None if (math.isnan(obj) or math.isinf(obj)) else obj
    if isinstance(obj, dict):
        return {k: _clean_floats(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_clean_floats(v) for v in obj]
    return obj


class McpServer:
    def __init__(self, spark=None):
        self._spark = spark
        self._calls: list[float] = []

    def spark(self):
        if self._spark is None:
            from .session import get_spark

            self._spark = get_spark("meridian-mcp-spark")
            self._spark.sparkContext.setLogLevel("ERROR")
        return self._spark

    # -- tool implementations ------------------------------------------------
    def _frame(self, args):
        from .sources.csv import read_csv_bytes

        return read_csv_bytes(self.spark(), args["csv_content"])

    def call_tool(self, name: str, args: dict):
        from .operators import engine_ops as eo

        df = self._frame(args)
        outcome = args["outcome_variable"]
        group = args["group_variable"]
        ref = args["reference_group"]
        preds = list(args["predictors"])
        cats = args.get("categorical_predictors")
        rid = "__ob_row_id__"

        if name == "forensic_decomposition":
            res = eo.run_decomposition(
                df, outcome, group, ref, preds, cats,
                bootstrap_reps=int(args.get("bootstrap_reps", 100)),
                reference_coefficients=args.get("reference_coefficients"),
                quantile=args.get("quantile"),
            )
            return asdict(res)
        if name == "simulate_remediation":
            res = eo.optimize(
                df, outcome, group, ref, preds, cats,
                budget=float(args.get("budget", 0.0)),
                strategy=(args.get("strategy") or "Greedy").lower(),
                target=(args.get("target") or "Reference").lower(),
                range_target=(args.get("range_target") or "Midpoint").lower(),
                confidence_level=float(args.get("confidence_level", 0.95)),
                min_gap_pct=float(args.get("min_gap_pct", 0.0)),
                forensic_mode=bool(args.get("forensic_mode", False)),
                adjust_both_groups=bool(args.get("adjust_both_groups", False)),
                id_col=rid,
            )
            return {
                "adjustments": [asdict(a) for a in res.adjustments],
                "total_cost": res.total_cost,
                "original_gap": res.original_gap,
                "new_gap": res.new_gap,
                "original_unexplained_gap": res.original_unexplained_gap,
                "new_unexplained_gap": res.new_unexplained_gap,
                "required_budget": res.required_budget,
                "model_coefficients": [asdict(c) for c in res.model_coefficients],
            }
        if name == "verify_adjustments":
            adj = [(a["index"], a["value"]) for a in args["adjustments"]]
            res = eo.verify_adjustments(df, adj, outcome, group, ref, preds, cats, id_col=rid)
            return asdict(res)
        if name == "check_defensibility":
            adj = [(a["index"], a["value"]) for a in args["adjustments"]]
            overrides = {
                a["index"]: {k: float(v) for k, v in (a.get("predictor_overrides") or {}).items()}
                for a in args["adjustments"]
                if a.get("predictor_overrides")
            }
            rows = eo.check_defensibility(
                df, adj, outcome, group, ref, preds, cats,
                overrides=overrides or None, id_col=rid,
            ).collect()
            return {"adjustments": [r.asDict() for r in rows]}
        if name == "generate_efficient_frontier":
            pts = eo.efficient_frontier(
                df, outcome, group, ref, preds, cats,
                steps=int(args.get("steps", 50)),
                max_budget=args.get("max_budget"),
                id_col=rid,
            )
            return {"points": [asdict(p) for p in pts]}
        raise ValueError(f"Unknown tool: {name}")

    # -- JSON-RPC ------------------------------------------------------------
    def handle(self, req: dict):
        method = req.get("method")
        rid = req.get("id")
        if method == "initialize":
            result = {
                "protocolVersion": "2024-11-05",
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "meridian-mcp-spark", "version": "0.1.0"},
            }
        elif method == "tools/list":
            result = {"tools": TOOLS}
        elif method == "ping":
            result = {}
        elif method == "tools/call":
            now = time.time()
            self._calls = [t for t in self._calls if now - t < 60.0]
            if len(self._calls) >= RATE_LIMIT_PER_MIN:
                return {
                    "jsonrpc": "2.0", "id": rid,
                    "error": {"code": -32000, "message": "Rate limit exceeded; retry later."},
                }
            self._calls.append(now)
            params = req.get("params") or {}
            try:
                payload = self.call_tool(params.get("name"), params.get("arguments") or {})
                result = {
                    "content": [{"type": "text", "text": json.dumps(_clean_floats(payload))}],
                    "isError": False,
                }
            except Exception as e:  # tool errors return isError, not protocol errors
                result = {"content": [{"type": "text", "text": str(e)}], "isError": True}
        elif method and method.startswith("notifications/"):
            return None
        else:
            return {
                "jsonrpc": "2.0", "id": rid,
                "error": {"code": -32601, "message": f"Method not found: {method}"},
            }
        return {"jsonrpc": "2.0", "id": rid, "result": result}


def main():  # pragma: no cover - interactive loop; logic covered via handle()
    server = McpServer()
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            continue
        resp = server.handle(req)
        if resp is not None:
            sys.stdout.write(json.dumps(resp) + "\n")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
