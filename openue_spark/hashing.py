"""Deterministic, process-independent hashing primitives.

Shared verbatim between the single-process numpy reference oracle
(openue_spark.oracle) and the Spark pandas UDFs so that triple parity is a
pure test of dataflow fidelity (SURVEY.md §5). Python's builtin hash() is
salted per process and therefore never used.

All functions are numpy-vectorized over uint64 with wraparound arithmetic.
"""

from __future__ import annotations

import zlib

import numpy as np

np.seterr(over="ignore")  # uint64 wraparound is intentional everywhere here

# splitmix64 finalizer constants (public domain, Sebastiano Vigna).
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_FNV = np.uint64(0xCBF29CE484222325)
_POLY_R = np.uint64(0x100000001B3)  # FNV prime as polynomial base

_U64 = np.uint64

# Precomputed R^1..R^N table (N >= max spliced sequence length).
_MAX_POW = 4096
_POWERS = np.empty(_MAX_POW, dtype=np.uint64)
_POWERS[0] = _POLY_R
for _i in range(1, _MAX_POW):
    _POWERS[_i] = _POWERS[_i - 1] * _POLY_R


def mix64(x: np.ndarray | int) -> np.ndarray:
    """splitmix64 finalizer: avalanching 64-bit mix, vectorized."""
    x = np.asarray(x, dtype=np.uint64)
    x = x ^ (x >> _U64(30))
    x = x * _C1
    x = x ^ (x >> _U64(27))
    x = x * _C2
    x = x ^ (x >> _U64(31))
    return x


def poly_hash(ids: np.ndarray) -> np.uint64:
    """Order-dependent polynomial fold of a token-id sequence -> uint64.

    h = mix64( FNV + sum_i ids[i] * R^(i+1) ) (mod 2^64), so permutations and
    length changes alter the hash. Vectorized via a precomputed power table.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    if ids.size == 0:
        return mix64(_FNV)[()]
    acc = _FNV + np.sum(ids * _POWERS[: ids.size], dtype=np.uint64)
    return mix64(acc)[()]


def poly_hash_batch(padded_ids: np.ndarray) -> np.ndarray:
    """Row-wise poly_hash over a zero-padded (n, L) uint64 matrix.

    Bit-identical to per-row `poly_hash` of the unpadded rows: padding with
    0 is exact because 0 * R^k contributes nothing to the fold.
    """
    mat = np.asarray(padded_ids, dtype=np.uint64)
    if mat.ndim != 2:
        raise ValueError("poly_hash_batch expects a 2-D padded matrix")
    n, length = mat.shape
    if length == 0:
        return np.full(n, mix64(_FNV)[()], dtype=np.uint64)
    acc = _FNV + (mat * _POWERS[:length][None, :]).sum(axis=1, dtype=np.uint64)
    return mix64(acc)


def crc32_id(token: str) -> int:
    """Stable 32-bit hash of a token string (used for word ids)."""
    return zlib.crc32(token.encode("utf-8")) & 0xFFFFFFFF
