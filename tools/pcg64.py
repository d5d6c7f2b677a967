"""Pure-Python PCG64 + SeedSequence, for oracle-checking numpy's Generator.

Independent reimplementation from the public specifications: PCG64 is the
XSL-RR 128/64 generator of O'Neill's PCG paper (pcg-random.org); the
seeding is numpy's documented SeedSequence entropy-pool algorithm. Together
they reproduce `np.random.default_rng(seed)` bit-for-bit (pinned against
numpy in tests/test_numpy_oracle.py), which lets the DuckDB gate replay
seeded simulation streams — the round-6 `mm_tau_stream` oracle advances
the same 128-bit LCG in SQL from constants this module derives.
"""

from __future__ import annotations

M32 = (1 << 32) - 1
M64 = (1 << 64) - 1
M128 = (1 << 128) - 1
PCG_MULT = 0x2360ED051FC65DA44385DF649FCCF645

_XSHIFT = 16
_MULT_INIT = 0x43B0D7E5
_MULT_A = 0x931E8875
_MIX_MULT_L = 0xCA01F9DD
_MIX_MULT_R = 0x4973F715
_GEN_INIT = 0x8B51F9DD
_GEN_MULT = 0x58F38DED


def seedseq_state(entropy: list[int], pool_size: int = 4, n_words: int = 4) -> list[int]:
    """numpy SeedSequence.generate_state(n_words, uint32) for integer
    entropy (each entry one uint32 word)."""
    hash_const = _MULT_INIT

    def hashmix(value: int) -> int:
        nonlocal hash_const
        value = (value ^ hash_const) & M32
        hash_const = (hash_const * _MULT_A) & M32
        value = (value * hash_const) & M32
        value ^= value >> _XSHIFT
        return value

    def mix(x: int, y: int) -> int:
        r = ((x * _MIX_MULT_L) & M32) - ((y * _MIX_MULT_R) & M32)
        r &= M32
        r ^= r >> _XSHIFT
        return r

    pool = [0] * pool_size
    for i in range(max(len(entropy), pool_size)):
        v = entropy[i] if i < len(entropy) else 0
        if i < pool_size:
            pool[i] = hashmix(v)
        else:
            pool[i % pool_size] = mix(pool[i % pool_size], hashmix(v))
    for i_src in range(pool_size):
        for i_dst in range(pool_size):
            if i_src != i_dst:
                pool[i_dst] = mix(pool[i_dst], hashmix(pool[i_src]))
    out = []
    gen_const = _GEN_INIT
    for i_dst in range(n_words):
        v = (pool[i_dst % pool_size] ^ gen_const) & M32
        gen_const = (gen_const * _GEN_MULT) & M32
        v = (v * gen_const) & M32
        v ^= v >> _XSHIFT
        out.append(v)
    return out


def seedseq_u64(entropy: list[int], n: int) -> list[int]:
    """n uint64 words (little-endian word pairing, as numpy packs them)."""
    w32 = seedseq_state(entropy, n_words=2 * n)
    return [(w32[2 * i] | (w32[2 * i + 1] << 32)) & M64 for i in range(n)]


class PCG64:
    """PCG XSL-RR 128/64 with numpy's default_rng seeding when constructed
    via :func:`from_numpy_seed`."""

    def __init__(self, initstate: int, initseq: int):
        self.state = 0
        self.inc = ((initseq << 1) | 1) & M128
        self._step()
        self.state = (self.state + initstate) & M128
        self._step()

    @classmethod
    def from_numpy_seed(cls, seed) -> "PCG64":
        entropy = seed if isinstance(seed, list) else [int(seed)]
        w = seedseq_u64(entropy, 4)
        return cls((w[0] << 64) | w[1], (w[2] << 64) | w[3])

    def _step(self) -> None:
        self.state = (self.state * PCG_MULT + self.inc) & M128

    def next64(self) -> int:
        self._step()
        s = self.state
        rot = s >> 122
        x = ((s >> 64) ^ (s & M64)) & M64
        return ((x >> rot) | (x << ((64 - rot) % 64))) & M64

    def uniform(self, lo: float, hi: float, n: int) -> list[float]:
        """numpy Generator.uniform: lo + (hi - lo) * ((u >> 11) * 2^-53),
        evaluated in exactly that operation order."""
        rng_width = hi - lo
        return [
            lo + rng_width * ((self.next64() >> 11) * (1.0 / 9007199254740992.0))
            for _ in range(n)
        ]
