"""Data-quality constraint checking (net-new; the Deequ-shaped validation
layer a production pipeline runs before training on a table).

`check_constraints` evaluates a declarative rule list against a DataFrame
and returns one row per rule: (constraint, detail, violations, n, ok).
Exact integer counts only — no float hash hazard — and every rule compiles
to a scale-safe shape:

- not_null / range / in_set / predicate: ONE shared aggregation pass over
  the scan (each rule is a conditional count column), map-side combined.
- unique: a groupBy on the key columns counting groups with multiplicity
  > 1 row members — one keyed shuffle, no self-join.
- foreign_key: a left-anti join against the (deduplicated) reference keys
  — broadcastable when the reference is a dimension table.

Reference scope note: the reference engine has no constraint surface; this
sits alongside profiling/drift as the data-health family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints"]

_ROW_RULES = ("not_null", "range", "in_set", "predicate")
_TABLE_RULES = ("min_rows", "freshness")


def _rule_detail(rule: dict) -> str:
    kind = rule["type"]
    if kind == "not_null":
        return rule["col"]
    if kind == "range":
        return f"{rule['col']} in [{rule['lo']}, {rule['hi']}]"
    if kind == "in_set":
        vals = ",".join(str(v) for v in rule["values"])
        return f"{rule['col']} in {{{vals}}}"
    if kind == "predicate":
        return rule["expr"]
    if kind == "unique":
        return ",".join(rule["cols"])
    if kind == "foreign_key":
        return f"{rule['col']} -> {rule['ref_col']}"
    if kind == "min_rows":
        return f"n >= {rule['n']}"
    if kind == "freshness":
        return f"max({rule['col']}) >= {rule['as_of']} - {rule['max_age_hours']}h"
    raise ValueError(f"unknown constraint type: {kind}")


def _violation_expr(rule: dict):
    """Row-level violation predicate for the shared-aggregation rules.
    Nulls: not_null counts them; range/in_set/predicate treat null as a
    violation too (a value that cannot be shown to satisfy the rule does
    not satisfy it — the strict reading a gate wants)."""
    kind = rule["type"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "range":
        c = F.col(rule["col"])
        ok = c.isNotNull() & (c >= F.lit(rule["lo"])) & (c <= F.lit(rule["hi"]))
        return ~ok
    if kind == "in_set":
        c = F.col(rule["col"])
        ok = c.isNotNull() & c.isin(list(rule["values"]))
        return ~ok
    if kind == "predicate":
        ok = F.expr(rule["expr"])
        return ~F.coalesce(ok, F.lit(False))
    raise ValueError(kind)


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate `rules` against `df`; returns (constraint, detail,
    violations, n, ok) per rule, in a deterministic schema any sink can
    consume. Rule dicts:

    - {"type": "not_null", "col": c}
    - {"type": "range", "col": c, "lo": x, "hi": y}   (inclusive)
    - {"type": "in_set", "col": c, "values": [...]}
    - {"type": "predicate", "expr": "<boolean SQL>"}  (null -> violation)
    - {"type": "unique", "cols": [c, ...]}            (rows in duplicated keys)
    - {"type": "foreign_key", "col": c, "ref": DataFrame, "ref_col": r}
      (non-null orphans; nulls are not_null's job)
    - {"type": "min_rows", "n": N}                    (table-level: row floor)
    - {"type": "freshness", "col": ts, "max_age_hours": H,
       "as_of": "<ISO timestamp>"}  (table-level: newest row no older than
      H hours before the caller-pinned as_of — an explicit as_of keeps the
      check deterministic/replayable instead of reading the wall clock)

    Table-level rules report violations = 1 when the table fails (n holds
    the measured quantity: row count / hours of staleness, ceil'd).
    All row-level AND table-level rules share ONE aggregation over a
    single scan; unique and foreign_key each add one keyed shuffle/anti-join. `violations`
    for unique counts the rows involved (group size) in keys with
    multiplicity > 1, the actionable number for a dedup step.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    spark = df.sparkSession
    row_rules = [r for r in rules if r["type"] in _ROW_RULES]
    table_rules = [r for r in rules if r["type"] in _TABLE_RULES]
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, r in enumerate(row_rules):
        aggs.append(
            F.sum(_violation_expr(r).cast("long")).cast("long").alias(f"__v{i}")
        )
    for i, r in enumerate(table_rules):
        if r["type"] == "freshness":
            aggs.append(F.max(F.col(r["col"]).cast("timestamp")).alias(f"__t{i}"))
    totals = df.agg(*aggs).collect()[0]
    n = int(totals["__n"])
    out_rows = []
    for i, r in enumerate(row_rules):
        v = int(totals[f"__v{i}"] or 0)
        out_rows.append((r["type"], _rule_detail(r), v, n, v == 0))
    for i, r in enumerate(table_rules):
        if r["type"] == "min_rows":
            ok = n >= int(r["n"])
            out_rows.append((r["type"], _rule_detail(r), int(not ok), n, ok))
        else:  # freshness
            import math
            from datetime import datetime

            as_of = datetime.fromisoformat(str(r["as_of"]))
            # Spark returns MAX(timestamp) as a NAIVE datetime in the
            # SESSION timezone; an aware as_of (e.g. '...T00:00:00+00:00')
            # would make the subtraction below raise TypeError. Convert an
            # aware as_of into the ACTUAL session zone (not an assumed UTC —
            # on a user-supplied non-UTC session that assumption silently
            # shifts every staleness verdict) and drop the tzinfo so both
            # sides of the subtraction live on the same clock.
            if as_of.tzinfo is not None:
                from zoneinfo import ZoneInfo

                tz_name = spark.conf.get("spark.sql.session.timeZone")
                try:
                    sess_tz = ZoneInfo(str(tz_name))
                except Exception as exc:
                    raise ValueError(
                        "freshness rule with a timezone-aware as_of needs an "
                        f"IANA spark.sql.session.timeZone; got {tz_name!r}"
                    ) from exc
                as_of = as_of.astimezone(sess_tz).replace(tzinfo=None)
            newest = totals[f"__t{i}"]
            if newest is None:
                out_rows.append((r["type"], _rule_detail(r), 1, 0, False))
            else:
                age_h = (as_of - newest).total_seconds() / 3600.0
                ok = age_h <= float(r["max_age_hours"])
                out_rows.append(
                    (r["type"], _rule_detail(r), int(not ok),
                     max(int(math.ceil(age_h)), 0), ok)
                )
    for r in rules:
        if r["type"] == "unique":
            v = int(
                df.groupBy(*[F.col(c) for c in r["cols"]])
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("long"))
                .collect()[0][0]
            )
            out_rows.append((r["type"], _rule_detail(r), v, n, v == 0))
        elif r["type"] == "foreign_key":
            ref = r["ref"].select(F.col(r["ref_col"]).alias("__k")).distinct()
            v = int(
                df.select(F.col(r["col"]).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(ref, "__k", "left_anti")
                .count()
            )
            out_rows.append((r["type"], _rule_detail(r), v, n, v == 0))
        elif r["type"] not in _ROW_RULES + _TABLE_RULES:
            raise ValueError(f"unknown constraint type: {r['type']}")
    return spark.createDataFrame(
        out_rows, "constraint string, detail string, violations long, n long, ok boolean"
    )
