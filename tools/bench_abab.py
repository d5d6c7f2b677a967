"""Interleaved A/B/A/B bench adjudication harness.

The build box's throughput swings 2-4x within minutes (NOTES_r11/r12: the
NumPy calibration kernel reads 0.032-0.271 s across back-to-back runs), so
across-session bench comparisons are meaningless — an apparent regression is
as likely a host phase as a code change. The protocol that survived two
false-alarm post-mortems (r11 mean_reps100 "1.97x", r12 mm_gram "22 s"):

  1. run variant A and variant B INTERLEAVED (A B A B ...), so both sample
     the same host phases;
  2. trust a run only if its own calibration rows are clean (the JVM
     fixed-cost job AND the NumPy bandwidth kernel);
  3. compare per-entry best-of over CLEAN runs only, and refuse a verdict
     for entries with no clean sample on either side.

This tool turns that manual NOTES protocol into a machine-readable artifact
(r12 verdict item 4). Variants are git revs (materialized read-only via
`git worktree add --detach` and removed afterwards) or existing directories;
`WORKTREE` names the current working tree, uncommitted changes included.

Usage:
  python tools/bench_abab.py A_REV B_REV [--iters 2] [--json OUT.json]
                             [--sf-dir DIR] [--label-a NAME --label-b NAME]

Each iteration runs bench.py once per variant in a fresh subprocess (fresh
JVM — no cross-variant cache pollution), parsing the final stdout JSON line.
Exit status: 0 = adjudicated (every shared entry got a verdict), 3 = some
entries had no clean pair (rerun with more --iters or at true idle), 2 = usage.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Clean-run bands (memory: JVM ratio ~0.72-0.87 on a good run, np best
# <= ~0.06 s; allow headroom — the gate exists to reject 2-4x phases, not
# 15% wobble).
JVM_RATIO_MAX = 1.2
NP_RATIO_MAX = 1.5


def run_bench(workdir: str, sf_dir: str | None, env_extra: dict | None = None) -> dict:
    """One bench.py run in a fresh subprocess; returns the parsed final JSON
    line plus wall time. Raises on parse failure (a bench that can't speak
    its one-line contract is a failed run, not a slow one)."""
    env = dict(os.environ)
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = time.time() - t0
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed in {workdir} (rc={p.returncode}): "
            f"{p.stderr.strip()[-500:]}"
        )
    out = json.loads(lines[-1])
    out["_wall_sec"] = round(wall, 1)
    return out


def is_clean(bench: dict) -> tuple[bool, str]:
    cal = bench.get("calibration", {})
    jvm = cal.get("ratio_vs_ref")
    np_r = cal.get("np_ratio_vs_ref")
    if jvm is None or np_r is None:
        return False, "no calibration rows"
    if jvm > JVM_RATIO_MAX:
        return False, f"jvm ratio {jvm} > {JVM_RATIO_MAX}"
    if np_r > NP_RATIO_MAX:
        return False, f"np ratio {np_r} > {NP_RATIO_MAX}"
    return True, "clean"


def materialize(rev: str, scratch: list) -> str:
    """Resolve a variant spec to a directory: WORKTREE = the live repo,
    an existing path = itself, anything else = a detached git worktree."""
    if rev == "WORKTREE":
        return REPO
    if os.path.isdir(rev) and os.path.exists(os.path.join(rev, "bench.py")):
        return os.path.abspath(rev)
    d = tempfile.mkdtemp(prefix="abab_wt_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", d, rev],
        cwd=REPO, check=True, capture_output=True,
    )
    scratch.append(d)
    return d


def cleanup(scratch: list) -> None:
    for d in scratch:
        subprocess.run(
            ["git", "worktree", "remove", "--force", d],
            cwd=REPO, capture_output=True,
        )


def adjudicate(runs_a: list, runs_b: list) -> tuple[dict, list]:
    """Per-entry best-of over clean runs; verdict only where both sides have
    at least one clean sample."""
    entries: dict = {}
    names = set()
    for r in runs_a + runs_b:
        names.update(r["bench"].get("queries", {}))
    names = {n for n in names if not n.startswith("calibration")}
    unadjudicated = []
    for name in sorted(names):
        sa = [r["bench"]["queries"][name] for r in runs_a
              if r["clean"] and name in r["bench"].get("queries", {})]
        sb = [r["bench"]["queries"][name] for r in runs_b
              if r["clean"] and name in r["bench"].get("queries", {})]
        row = {
            "a_clean_samples": sa,
            "b_clean_samples": sb,
        }
        if sa and sb:
            a_best, b_best = min(sa), min(sb)
            row.update({
                "a_best": a_best,
                "b_best": b_best,
                "b_over_a": round(b_best / a_best, 3) if a_best > 0 else None,
            })
        else:
            row["verdict"] = "NO CLEAN PAIR"
            unadjudicated.append(name)
        entries[name] = row
    return entries, unadjudicated


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("rev_a", help="git rev, directory, or WORKTREE")
    ap.add_argument("rev_b", help="git rev, directory, or WORKTREE")
    ap.add_argument("--iters", type=int, default=2,
                    help="interleaved iterations (each = one A run + one B run)")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write the full artifact here as well")
    ap.add_argument("--sf-dir", default=None,
                    help="SPARK_GRAFT_SF_DIR passthrough for both variants")
    ap.add_argument("--label-a", default=None)
    ap.add_argument("--label-b", default=None)
    args = ap.parse_args(argv)
    if args.iters < 1:
        ap.error("--iters must be >= 1")

    scratch: list = []
    try:
        dir_a = materialize(args.rev_a, scratch)
        dir_b = materialize(args.rev_b, scratch)
    except subprocess.CalledProcessError as exc:
        print(json.dumps({"error": f"cannot materialize rev: {exc.stderr.decode()[-300:]}"}))
        cleanup(scratch)
        return 2

    runs_a, runs_b = [], []
    try:
        for i in range(args.iters):
            for tag, d, sink in (("A", dir_a, runs_a), ("B", dir_b, runs_b)):
                bench = run_bench(d, args.sf_dir)
                clean, why = is_clean(bench)
                sink.append({"iter": i, "clean": clean, "why": why, "bench": bench})
                print(
                    f"[{tag}{i}] total={bench.get('value')}s "
                    f"cal_jvm={bench.get('calibration', {}).get('ratio_vs_ref')} "
                    f"cal_np={bench.get('calibration', {}).get('np_ratio_vs_ref')} "
                    f"{'CLEAN' if clean else 'DIRTY: ' + why}",
                    file=sys.stderr,
                )
    finally:
        cleanup(scratch)

    entries, unadjudicated = adjudicate(runs_a, runs_b)
    artifact = {
        "a": args.label_a or args.rev_a,
        "b": args.label_b or args.rev_b,
        "iters": args.iters,
        "sf_dir": args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "clean_runs": {"a": sum(r["clean"] for r in runs_a),
                       "b": sum(r["clean"] for r in runs_b)},
        "runs": {
            "a": [{k: r[k] for k in ("iter", "clean", "why")} |
                  {"total": r["bench"].get("value"),
                   "calibration": r["bench"].get("calibration"),
                   "queries": r["bench"].get("queries")} for r in runs_a],
            "b": [{k: r[k] for k in ("iter", "clean", "why")} |
                  {"total": r["bench"].get("value"),
                   "calibration": r["bench"].get("calibration"),
                   "queries": r["bench"].get("queries")} for r in runs_b],
        },
        "entries": entries,
        "unadjudicated": unadjudicated,
    }
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))
    return 3 if unadjudicated else 0


if __name__ == "__main__":
    sys.exit(main())
