"""Deterministic 64-bit integer mixing (splitmix64 finalizer).

All synthetic-data generation and sketching in this repo uses these fixed
integer mixes — never Python's salted ``hash()`` — so every fixture and
every MinHash/SimHash signature is bit-reproducible across processes,
partitions, and runs. numpy uint64 arithmetic wraps mod 2^64, which is
exactly the semantics we want.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """splitmix64 finalizer: a high-quality 64-bit bijective mix."""
    z = np.uint64(x) if np.isscalar(x) else x.astype(np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the semantics
        z = z + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def mix2(a: np.ndarray | int, b: int) -> np.ndarray | np.uint64:
    """Mix two values: mix64(mix64(a) ^ b)."""
    return mix64(mix64(a) ^ np.uint64(b))


def mix3(a: np.ndarray | int, b: int, c: int) -> np.ndarray | np.uint64:
    return mix64(mix2(a, b) ^ np.uint64(c))
