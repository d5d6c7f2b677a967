"""MCP server tests: tools/list parity with meridian-mcp and end-to-end tool
calls through the JSON-RPC handler."""

import json

from oaxaca_blinder_rs_spark.mcp_server import McpServer

CSV = """wage,education,gender
10.0,12.0,F
12.0,16.0,F
11.0,14.0,F
13.0,16.0,F
15.0,18.0,F
20.0,12.0,M
22.0,16.0,M
21.0,14.0,M
23.0,16.0,M
25.0,18.0,M
"""

BASE_ARGS = {
    "csv_content": CSV,
    "outcome_variable": "wage",
    "group_variable": "gender",
    "reference_group": "F",
    "predictors": ["education"],
}


def _call(server, name, extra=None):
    req = {
        "jsonrpc": "2.0",
        "id": 1,
        "method": "tools/call",
        "params": {"name": name, "arguments": {**BASE_ARGS, **(extra or {})}},
    }
    resp = server.handle(req)
    assert resp["result"]["isError"] is False, resp["result"]
    return json.loads(resp["result"]["content"][0]["text"])


def test_tools_list(spark):
    server = McpServer(spark)
    resp = server.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in resp["result"]["tools"]}
    assert names == {
        "forensic_decomposition",
        "simulate_remediation",
        "verify_adjustments",
        "check_defensibility",
        "generate_efficient_frontier",
    }


def test_initialize_and_unknown(spark):
    server = McpServer(spark)
    init = server.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize"})
    assert init["result"]["serverInfo"]["name"] == "meridian-mcp-spark"
    bad = server.handle({"jsonrpc": "2.0", "id": 2, "method": "nope"})
    assert bad["error"]["code"] == -32601


def test_forensic_decomposition_tool(spark):
    server = McpServer(spark)
    out = _call(server, "forensic_decomposition", {"bootstrap_reps": 5})
    # library gap convention: mean(non-reference M) - mean(reference F) = +10
    assert abs(out["total_gap"] - 10.0) < 1e-6
    # engine summary convention: group A = reference (F)
    assert out["data_summary"]["group_a_count"] == 5


def test_remediation_and_verify_roundtrip(spark):
    server = McpServer(spark)
    # remediation standard = the advantaged group's wage model (M), so the
    # underpaid F rows are the target (engine convention: reference = fair
    # standard, analysis.rs:389-460)
    opt = _call(server, "simulate_remediation", {"budget": 0.0, "reference_group": "M"})
    assert opt["required_budget"] > 0
    adj = [
        {"index": a["index"], "value": a["adjustment"]}
        for a in opt["adjustments"]
        if a["adjustment"] > 0
    ]
    ver = _call(server, "verify_adjustments", {"adjustments": adj, "reference_group": "M"})
    assert abs(ver["total_gap"]) <= abs(opt["original_gap"]) + 1e-9


def test_frontier_tool(spark):
    server = McpServer(spark)
    out = _call(server, "generate_efficient_frontier", {"steps": 5})
    assert len(out["points"]) == 6
    assert out["points"][0]["budget"] == 0.0


def test_tool_error_is_not_protocol_error(spark):
    server = McpServer(spark)
    req = {
        "jsonrpc": "2.0", "id": 9, "method": "tools/call",
        "params": {"name": "forensic_decomposition",
                   "arguments": {**BASE_ARGS, "outcome_variable": "missing_col"}},
    }
    resp = server.handle(req)
    assert resp["result"]["isError"] is True
    assert "missing_col" in resp["result"]["content"][0]["text"]
