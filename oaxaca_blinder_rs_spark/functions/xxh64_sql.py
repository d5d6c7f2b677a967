"""XXH64 transliterated to DuckDB SQL — the oracle side of `F.xxhash64`.

Spark's `xxhash64(string_col)` hashes the UTF-8 bytes of the string with
seed 42 (public XXH64 spec,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). DuckDB has
no xxhash64, which until round 6 made the SimHash operators rows-only at
the driver. This module generates a pure-SQL replay of the full algorithm —
stripe loop via `list_reduce` over 4-lane structs, bounded tail rounds
unrolled behind CASE guards, avalanche staged through lateral column
aliases — so `simhash`/`simhash_dups` become real hash-matched rows.

All arithmetic runs in HUGEINT (int128) with explicit `% 2^64` reductions;
64x64-bit products use the 32-bit-split identity
  a*b mod 2^64 = (al*bl + ((al*bh + ah*bl) mod 2^32) * 2^32) mod 2^64
so no intermediate exceeds ~2^95. The construction mirrors the Cody-erf
SQL replay (`__spark_entry__._erf_stage_sql`) that made the Heckman/DFL
oracles hash-matched in round 5; the independent bit-exactness anchor is
`tools/xxh64.py` (itself proven bit-identical to Spark in the suite).
"""

from __future__ import annotations

M64 = 1 << 64
M32 = 1 << 32
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42

_H = "::HUGEINT"


def _mod64(x: str) -> str:
    return f"(({x}) % {M64}{_H})"


def _mulc(a: str, c: int) -> str:
    """(a * c) mod 2^64 for constant c; `a` is referenced 4x — pass a short
    expression (column name / struct field / list element)."""
    ch, cl = c >> 32, c & (M32 - 1)
    return (
        f"(((({a}) % {M32})*{cl}{_H}"
        f" + (((({a}) % {M32})*{ch}{_H} + (({a}) // {M32})*{cl}{_H}) % {M32}) * {M32}{_H}"
        f") % {M64}{_H})"
    )


def _rotl(x: str, r: int) -> str:
    """rotl64 — `x` referenced twice; the two parts occupy disjoint bits so
    `+` is `|`."""
    return f"((({x}) * {1 << r}{_H}) % {M64}{_H} + (({x}) // {1 << (64 - r)}{_H}))"


def _accum_round(acc: str, lane: str) -> str:
    """XXH64 accumulator round: rotl31(acc + lane*P2) * P1 (mod 2^64)."""
    inner = _mod64(f"({acc}) + {_mulc(lane, P2)}")
    return _mulc(_rotl(inner, 31), P1)


def _round0(v: str) -> str:
    """_round(0, v) = rotl31(v*P2) * P1 (mod 2^64) — the merge-side lane mix."""
    return _mulc(_rotl(_mod64(_mulc(v, P2)), 31), P1)


def xxh64_select_sql(src: str, str_col: str, id_cols: str, out_col: str = "xh") -> str:
    """A SELECT over `src` emitting `id_cols` plus `out_col` = the unsigned
    XXH64 (seed 42) of the UTF-8 bytes of `str_col`, as HUGEINT in [0, 2^64).

    One row in, one row out. Each algorithm step is its own nested-subquery
    stage (a real projection node), NOT a lateral column alias: DuckDB
    expands lateral aliases by textual substitution, so a 15-deep chain of
    2-3x self-references would explode the plan exponentially — nested
    SELECTs keep every stage evaluated exactly once. Out-of-range list
    indexes yield NULL, which is safe: every potentially-missing access
    sits behind a CASE length guard.
    """
    a0 = (SEED + P1 + P2) % M64
    b0 = (SEED + P2) % M64
    c0 = SEED % M64
    d0 = (SEED - P1) % M64
    word = " + ".join(f"__by[8*w + {t + 1}] * {1 << (8 * t)}{_H}" for t in range(8))
    lam = ", ".join(
        f"'{f}': {_accum_round(f'acc.{f}', f'x.{f}')}" for f in ("a", "b", "c", "d")
    )
    conv = _mod64(
        " + ".join(_rotl(f"(__v).{f}", r) for f, r in (("a", 1), ("b", 7), ("c", 12), ("d", 18)))
    )
    u32 = " + ".join(f"__by[__i1 + {t + 1}] * {1 << (8 * t)}{_H}" for t in range(4))
    # Ordered stages; columns within one stage never reference each other.
    stages: list[list[str]] = [
        [f"encode({str_col}) AS __bl"],
        ["octet_length(__bl) AS __n", "hex(__bl) AS __hx"],
        [
            "list_transform(range(0, __n), j -> "
            f"('0x' || substr(__hx, 2*j + 1, 2))::UBIGINT{_H}) AS __by",
            "(__n // 32) * 32 AS __i0",
        ],
        [f"list_transform(range(0, __n // 8), w -> {word}) AS __wd", "__n - __i0 AS __rem"],
        [
            "list_reduce(list_concat("
            f"[{{'a': {a0}{_H}, 'b': {b0}{_H}, 'c': {c0}{_H}, 'd': {d0}{_H}}}], "
            "list_transform(range(0, __n // 32), si -> "
            "{'a': __wd[4*si + 1], 'b': __wd[4*si + 2], "
            "'c': __wd[4*si + 3], 'd': __wd[4*si + 4]})), "
            f"(acc, x) -> {{{lam}}}) AS __v",
            "__i0 + (__rem // 8) * 8 AS __i1",
        ],
        # converge + merge-round lane mixes (all functions of __v alone)
        [f"{conv} AS __hb0", "__n - __i1 AS __r4"]
        + [f"{_round0(f'(__v).{f}')} AS __r0{f}" for f in ("a", "b", "c", "d")]
        # 8-byte tail lane mixes (functions of __wd/__i0; NULL-safe when short)
        + [f"{_round0(f'__wd[__i0//8 + {t + 1}]')} AS __k8{t}" for t in range(3)],
    ]
    # merge rounds: h = (xor(h, round0(v)) * P1 + P4) mod 2^64 — one stage
    # each so the 4x-referenced _mulc argument is a short xor() of columns.
    for i, f in enumerate(("a", "b", "c", "d")):
        prev = f"__hb{i}"
        stages.append(
            [f"{_mod64(_mulc(f'xor({prev}, __r0{f})', P1) + f' + {P4}{_H}')} AS __hb{i + 1}"]
        )
    stages.append(
        [f"CASE WHEN __n >= 32 THEN __hb4 ELSE {(SEED + P5) % M64}{_H} END AS __h0"]
    )
    stages.append([f"(__h0 + __n) % {M64}{_H} AS __h1"])
    # 8-byte tail rounds: h = (rotl27(xor(h, k)) * P1 + P4) mod 2^64
    for t in range(3):
        prev = f"__h{t + 1}"
        step = _mod64(_mulc(_rotl(f"xor({prev}, __k8{t})", 27), P1) + f" + {P4}{_H}")
        stages.append(
            [f"CASE WHEN __rem >= {8 * (t + 1)} THEN {step} ELSE {prev} END AS __h{t + 2}"]
        )
    stages.append([f"{u32} AS __u32"])
    stages.append([f"{_mod64(_mulc('__u32', P1))} AS __u4m"])
    tail4_step = _mod64(_mulc(_rotl("xor(__h4, __u4m)", 23), P2) + f" + {P3}{_H}")
    stages.append(
        [
            f"CASE WHEN __r4 >= 4 THEN {tail4_step} ELSE __h4 END AS __h5",
            "__i1 + CASE WHEN __r4 >= 4 THEN 4 ELSE 0 END AS __i2",
        ]
    )
    stages.append(
        ["__n - __i2 AS __r1"]
        + [f"{_mod64(f'__by[__i2 + {t + 1}] * {P5}{_H}')} AS __b1m{t}" for t in range(3)]
    )
    # single-byte tail rounds: h = (rotl11(xor(h, b*P5)) * P1) mod 2^64
    for t in range(3):
        prev = f"__h{t + 5}"
        step = _mod64(_mulc(_rotl(f"xor({prev}, __b1m{t})", 11), P1))
        stages.append(
            [f"CASE WHEN __r1 >= {t + 1} THEN {step} ELSE {prev} END AS __h{t + 6}"]
        )
    # avalanche
    stages.append([f"xor(__h8, __h8 // {1 << 33}{_H}) AS __av1"])
    stages.append([f"{_mulc('__av1', P2)} AS __av2"])
    stages.append([f"xor(__av2, __av2 // {1 << 29}{_H}) AS __av3"])
    stages.append([f"{_mulc('__av3', P3)} AS __av4"])
    stages.append([f"xor(__av4, __av4 // {1 << 32}{_H}) AS {out_col}"])
    sql = f"SELECT {id_cols}, {', '.join(stages[0])} FROM {src}"
    for cols in stages[1:]:
        sql = f"SELECT *, {', '.join(cols)} FROM ({sql})"
    return f"SELECT {id_cols}, {out_col} FROM ({sql})"
