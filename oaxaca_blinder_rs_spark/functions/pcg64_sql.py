"""PCG64 (XSL-RR 128/64) transliterated to DuckDB SQL.

The round-6 sibling of the XXH64 transliteration: numpy's default_rng is
PCG64 under SeedSequence seeding, so a seeded simulation stream —
previously the canonical "un-oracle-able input" — can be replayed in SQL
and hash-checked bit-for-bit. The SEEDING (SeedSequence entropy pool +
the generator's two warm-up steps) runs in pure Python at SQL-build time
via tools/pcg64.py (an independent reimplementation of the public specs,
pinned against numpy in the suite); what the SQL replays is the stream
itself: one 128-bit LCG advance per draw in a recursive CTE over
two-HUGEINT state halves, the XSL-RR output rotation, and the exact
float64 uniform transform lo + (hi-lo) * ((u >> 11) * 2^-53) in numpy's
operation order.

128-bit arithmetic notes: a 64x64 full product does not fit HUGEINT
(int128 signed), so products use 32-bit limbs — t0 = a0*b0,
t1 = a1*b0 + (t0 >> 32), t2 = a0*b1 + (t1 & m32), lo = (t2 & m32) << 32
| (t0 & m32), hi = a1*b1 + (t1 >> 32) + (t2 >> 32) — every intermediate
stays under 2^66. The state advance s' = s*M + inc mod 2^128 combines
the full low product with the two cross-term low halves plus an explicit
add-carry. Limb staging happens in nested subqueries INSIDE the
recursive term (the one place lateral staging is unavailable), so each
expression references short column names only.
"""

from __future__ import annotations

import importlib.util
import os

M32 = (1 << 32) - 1
M64 = 1 << 64
_H = "::HUGEINT"


def _tools_pcg64():
    spec = importlib.util.spec_from_file_location(
        "_ob_tools_pcg64",
        os.path.join(os.path.dirname(__file__), "..", "..", "tools", "pcg64.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _product_stages(pref: str, a0: str, a1: str, b: int):
    """Stage column definitions for the 64x64 product (a1*2^32 + a0) * b
    with constant b, as four sequential dicts {col_name: expr}. Columns
    are namespaced by ``pref``; exprs in stage k reference only stage <k
    columns (or the a0/a1 inputs)."""
    b0, b1 = b & M32, b >> 32
    s0 = {f"{pref}t0": f"({a0} * {b0}{_H})"}
    s1 = {f"{pref}t1": f"({a1} * {b0}{_H} + {pref}t0 // 4294967296)"}
    s2 = {f"{pref}t2": f"({a0} * {b1}{_H} + {pref}t1 % 4294967296)"}
    s3 = {
        f"{pref}lo": f"(({pref}t2 % 4294967296) * 4294967296 + {pref}t0 % 4294967296)",
        f"{pref}hi": f"(({a1} * {b1}{_H} + {pref}t1 // 4294967296 + {pref}t2 // 4294967296) % {M64}{_H})",
    }
    return [s0, s1, s2, s3]


def pcg64_raw_sql(entropy, n: int) -> str:
    """A SELECT emitting (i, out) for i in 1..n — raw XSL-RR uint64 output
    i of numpy default_rng(entropy)'s PCG64, as a HUGEINT in [0, 2^64).

    This is the stream every numpy draw type consumes: `uniform` takes one
    whole output per double ((out >> 11) * 2^-53); `integers` with a
    < 2^32 range consumes BUFFERED 32-bit halves (LOW half first, then the
    saved HIGH half) through Lemire rejection — so an oracle can carve
    taus and bounded index picks out of one shared chain exactly as the
    engine's single default_rng(seed) does (see the mm_small_exact
    oracle in __spark_entry__.py)."""
    pcg = _tools_pcg64()
    g = pcg.PCG64.from_numpy_seed(entropy)
    mult = pcg.PCG_MULT
    sh0, sl0 = g.state >> 64, g.state & (M64 - 1)
    ih, il = g.inc >> 64, g.inc & (M64 - 1)
    ml, mh = mult & (M64 - 1), mult >> 64
    # products: a (sl * ML, need lo+hi), b (sl * MH, low half), c (sh * ML,
    # low half) — limbs computed once in the innermost stage
    stages: list[dict[str, str]] = [
        {
            "__a0": "sl % 4294967296",
            "__a1": "sl // 4294967296",
            "__c0": "sh % 4294967296",
            "__c1": "sh // 4294967296",
        }
    ]
    prods = (
        _product_stages("__pa_", "__a0", "__a1", ml),
        _product_stages("__pb_", "__a0", "__a1", mh),
        _product_stages("__pc_", "__c0", "__c1", ml),
    )
    for k in range(4):
        merged: dict[str, str] = {}
        for p in prods:
            merged.update(p[k])
        stages.append(merged)
    # assemble nested subqueries: innermost selects i + limbs from st,
    # each wrapper adds one stage's columns
    inner = f"SELECT i, sh, sl, "
    inner += ", ".join(f"{e} AS {c}" for c, e in stages[0].items())
    inner += f" FROM st WHERE i < {n}"
    for stg in stages[1:]:
        cols = ", ".join(f"{e} AS {c}" for c, e in stg.items())
        inner = f"SELECT *, {cols} FROM ({inner})"
    step = f"""
      SELECT i + 1 AS i,
             ((__pa_hi + __pb_lo + __pc_lo) % {M64}{_H}
              + {ih}{_H}
              + CASE WHEN __pa_lo + {il}{_H} >= {M64}{_H} THEN 1 ELSE 0 END
             ) % {M64}{_H} AS sh,
             (__pa_lo + {il}{_H}) % {M64}{_H} AS sl
      FROM ({inner})
    """
    return f"""
WITH RECURSIVE st(i, sh, sl) AS (
  SELECT 0, {sh0}{_H}, {sl0}{_H}
  UNION ALL
  {step}
)
SELECT i,
       CASE WHEN __rot = 0 THEN __x
            ELSE (__x // (1{_H} << __rot)
                  + (__x * (1{_H} << (64 - __rot))) % {M64}{_H}) % {M64}{_H}
       END AS out
FROM (
  SELECT i, sh // 288230376151711744 AS __rot, xor(sh, sl) AS __x
  FROM st WHERE i >= 1
)
"""


def pcg64_uniform_sql(entropy, n: int, lo: float, hi: float) -> str:
    """A SELECT emitting (i, tau) for i in 1..n — draw i of
    numpy default_rng(entropy).uniform(lo, hi), bit-exact."""
    return f"""
SELECT i,
       {lo!r} + ({hi!r} - {lo!r}) * (CAST(out // 2048 AS DOUBLE) * (1.0 / 9007199254740992.0)) AS tau
FROM ({pcg64_raw_sql(entropy, n)})
"""
