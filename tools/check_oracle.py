"""Replicate the driver's oracle comparison locally.

Runs each __spark_entry__.queries() entry at sf0.01 (or $SPARK_GRAFT_SF_DIR)
AND its oracle_sql() through DuckDB, then compares row count, column names and
an order-insensitive value multiset.

Usage: python tools/check_oracle.py [--json OUT.json] [query_name ...]

With --json, a machine-readable sweep artifact is written: one record per
registered query (rows_match / schema_match / values_match booleans, row
counts, error, elapsed seconds) plus run metadata (sf dir, git rev, registry
size). Committed each round as ORACLE_SWEEP_r{N}.json, this is the
full-registry correctness record that complements the driver's 50-row
window (CORRECTNESS_r{N}.json) once the registry outgrows 2x the window.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    return v


def norm_rows(rows):
    return sorted([tuple(norm_val(v) for v in r) for r in rows], key=repr)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = set(args)
    records: dict = {}
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = records[name] = {
            "rows_match": False, "schema_match": False, "values_match": False,
            "spark_rows": None, "oracle_rows": None, "rows_only": False,
            "err": None, "secs": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"
            rec["secs"] = round(time.time() - t0, 1)
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            rec["rows_only"] = True
            rec["rows_match"] = len(srows) > 0
            rec["secs"] = round(time.time() - t0, 1)
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c.lower() for c in ores.columns]
            otypes = [str(t) for t in ores.types]
            orows = ores.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"
            rec["secs"] = round(time.time() - t0, 1)
            failures.append(name)
            continue
        rec["oracle_rows"] = len(orows)
        ok = True
        # The driver's hasher serializes *typed* values: a DuckDB HUGEINT
        # (int128, e.g. from list_sum or sum(BIGINT)) or DECIMAL hashes
        # differently from Spark's BIGINT/DOUBLE even when the Python values
        # compare equal (the round-4 winnow_fingerprints red). Flag any
        # oracle column type outside the Spark-representable set.
        _OK_TYPES = {
            "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
            "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
            "TIMESTAMP WITH TIME ZONE", "BIGINT[]", "INTEGER[]",
            "DOUBLE[]", "FLOAT[]", "VARCHAR[]",
        }
        bad_types = [(c, t) for c, t in zip(ores.columns, otypes) if t not in _OK_TYPES]
        if bad_types:
            print(f"[FAIL] {name}: oracle emits driver-hash-unsafe types {bad_types} "
                  f"(CAST to BIGINT/DOUBLE in the SQL)")
            rec["err"] = f"hash-unsafe oracle types: {bad_types}"
            ok = False
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            print(f"[FAIL] {name}: row count {len(srows)} vs {len(orows)}")
            ok = False
        rec["schema_match"] = sorted(c.lower() for c in scols) == sorted(ocols)
        if not rec["schema_match"]:
            print(f"[FAIL] {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        if ok:
            # align column order by sorted name
            sidx = [scols.index(c) for c in sorted(scols, key=str.lower)]
            oidx = [ores.columns.index(c) for c in sorted(ores.columns, key=str.lower)]
            s_norm = norm_rows([[r[i] for i in sidx] for r in srows])
            o_norm = norm_rows([[r[i] for i in oidx] for r in orows])
            if s_norm != o_norm:
                diffs = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:5]
                print(f"[FAIL] {name}: value mismatch; first diffs: {diffs}")
                rec["err"] = rec["err"] or "value multiset mismatch"
                ok = False
            else:
                rec["values_match"] = True
        rec["secs"] = round(time.time() - t0, 1)
        if ok:
            print(f"[OK]   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    spark.stop()
    if json_out:
        n_ok = sum(
            1 for r in records.values()
            if r["values_match"] or (r["rows_only"] and r["rows_match"])
        )
        try:
            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        except Exception:
            rev = ""
        artifact = {
            "sf_dir": sf_dir,
            "git_rev": rev,
            "generated_unix": int(time.time()),
            "registry_size": len(qs),
            "checked": len(records),
            "green": n_ok,
            "failed": sorted(failures),
            "queries": records,
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=False)
        print(f"\nwrote {json_out}: {n_ok}/{len(records)} green")
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nAll queries match.")


if __name__ == "__main__":
    main()
