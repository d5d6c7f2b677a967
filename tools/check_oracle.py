"""Replicate the driver's oracle comparison locally.

Runs each __spark_entry__.queries() entry at sf0.01 (or $SPARK_GRAFT_SF_DIR)
AND its oracle_sql() through DuckDB, then compares row count, column names and
an order-insensitive value multiset.

Usage: python tools/check_oracle.py [--json OUT.json] [--procs N] [query_name ...]

With --json, a machine-readable sweep artifact is written: one record per
registered query (rows_match / schema_match / values_match booleans, row
counts, error, elapsed seconds) plus run metadata (sf dir, git rev, registry
size). Committed each round as ORACLE_SWEEP_r{N}.json, this is the
full-registry correctness record that complements the driver's 50-row
window (CORRECTNESS_r{N}.json) once the registry outgrows 2x the window.

Sweep-latency levers (r12 verdict item 5):

- The DuckDB side of every oracle is a PURE function of (oracle SQL, sf
  dir), so results are cached under .oracle_cache/ keyed by the sha256 of
  both — the two unrolled-CTE giants (heckman_decomposition 61 s,
  machado_mata 23 s) pay their probit/QR replay once per SF per SQL text,
  not once per sweep. Set ORACLE_CACHE=0 to force fresh oracle runs (the
  committed round-close sweep should use the cache only for oracles whose
  SQL is unchanged — which the content hash guarantees).
- --procs N splits the registry across N subprocesses (greedy LPT-packed by
  the previous committed sweep's per-query seconds) and merges their
  records into one artifact; each subprocess gets its own local[8] Spark.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import pickle
import subprocess
import sys
import tempfile
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


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE_DIR = os.environ.get("ORACLE_CACHE_DIR", os.path.join(_REPO, ".oracle_cache"))


def _data_fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of the SF dir: every parquet file's
    relative path + size + mtime_ns. r14 (ADVICE): without this, a
    regenerated testdata tree under the SAME path silently replays stale
    oracle results into a committed sweep artifact. size+mtime is the
    rsync-level check — exact for the driver's write-once testdata, and
    any regeneration rewrites mtimes."""
    parts = []
    for root, _dirs, files in os.walk(sf_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            parts.append(f"{os.path.relpath(p, sf_dir)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(sorted(parts))


def _cache_key(sql: str, sf_dir: str) -> str:
    import duckdb as _d
    h = hashlib.sha256()
    h.update(sql.encode())
    h.update(b"\0")
    h.update(os.path.abspath(sf_dir).encode())
    h.update(b"\0")
    h.update(_d.__version__.encode())
    h.update(b"\0")
    h.update(_data_fingerprint(sf_dir).encode())
    return h.hexdigest()


def oracle_cached(con, sql: str, sf_dir: str):
    """Run (or replay) an oracle: returns (columns, type_strs, rows). The
    oracle is a pure function of its SQL text and the SF parquet data, so a
    content-hash cache is exact — any edit to the SQL, or any regeneration
    of the testdata (size/mtime fingerprint), is a new key."""
    if os.environ.get("ORACLE_CACHE", "1") == "0":
        res = con.sql(sql)
        return res.columns, [str(t) for t in res.types], res.fetchall()
    path = os.path.join(_CACHE_DIR, _cache_key(sql, sf_dir) + ".pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                return pickle.load(fh)
        except Exception:
            pass  # unreadable cache entry -> recompute
    res = con.sql(sql)
    out = (res.columns, [str(t) for t in res.types], res.fetchall())
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=_CACHE_DIR, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump(out, fh)
        os.replace(tmp, path)  # atomic: concurrent --procs writers are safe
    except Exception:
        pass
    return out


def _lpt_split(names, n_procs):
    """Greedy longest-processing-time partition using the latest committed
    sweep's per-query seconds as the cost model (unknown rows cost 5 s)."""
    costs = {}
    try:
        sweeps = sorted(
            (f for f in os.listdir(_REPO) if f.startswith("ORACLE_SWEEP_r") and f.endswith(".json")),
            key=lambda f: os.path.getmtime(os.path.join(_REPO, f)),
        )
        if sweeps:
            with open(os.path.join(_REPO, sweeps[-1])) as fh:
                for q, rec in json.load(fh).get("queries", {}).items():
                    if rec.get("secs") is not None:
                        costs[q] = float(rec["secs"])
    except Exception:
        pass
    buckets = [[] for _ in range(n_procs)]
    loads = [0.0] * n_procs
    for name in sorted(names, key=lambda n: -costs.get(n, 5.0)):
        i = loads.index(min(loads))
        buckets[i].append(name)
        loads[i] += costs.get(name, 5.0)
    return [b for b in buckets if b]


def run_split(n_procs, names, sf_dir, json_out):
    """Parent mode for --procs: fan the registry out over subprocesses, each
    writing a partial --json artifact, then merge."""
    tmpdir = tempfile.mkdtemp(prefix="oracle_sweep_")
    procs = []
    chunks = _lpt_split(names, n_procs)
    for i, chunk in enumerate(chunks):
        part = os.path.join(tmpdir, f"part{i}.json")
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--json", part] + chunk,
            env=dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        procs.append((p, part, chunk))
    records, failures = {}, []
    for p, part, chunk in procs:
        out, _ = p.communicate(timeout=7200)
        for ln in out.splitlines():
            if ln.startswith(("[OK]", "[FAIL]", "[rows-only]")):
                print(ln)
        try:
            with open(part) as fh:
                artifact = json.load(fh)
            records.update(artifact["queries"])
            failures.extend(artifact["failed"])
        except Exception as e:
            print(f"[FAIL] worker for {chunk[:3]}...: no artifact ({e})")
            failures.extend(chunk)
    return records, sorted(set(failures))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    json_out = None
    n_procs = 1
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--procs" in args:
        i = args.index("--procs")
        n_procs = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    only = set(args)
    records: dict = {}
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    if n_procs > 1:
        names = [n for n in qs if not only or n in only]
        records, failures = run_split(n_procs, names, sf_dir, json_out)
        finish(records, failures, qs, sf_dir, json_out)
        return
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
            ocols_raw, otypes, orows = oracle_cached(con, oracles[name], sf_dir)
            ocols = [c.lower() for c in ocols_raw]
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
        bad_types = [(c, t) for c, t in zip(ocols_raw, otypes) if t not in _OK_TYPES]
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
            oidx = [ocols_raw.index(c) for c in sorted(ocols_raw, key=str.lower)]
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
    finish(records, failures, qs, sf_dir, json_out)


def finish(records, failures, qs, sf_dir, json_out):
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
