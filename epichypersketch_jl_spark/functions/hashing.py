"""Vectorized 64-bit hashing used by HLL / Bloom / MinHash / SimHash.

Distinct from the CMS pattern-key hash (that one reproduces the reference's
linear-coefficient double-mod scheme and lives in sketches/cms.py).  These are
general-purpose mixers: splitmix64 for integers, pandas' SipHash-based
hash_array (fixed key => deterministic across processes/machines) for strings,
composed with a seed mix.  Everything is numpy-vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer; uint64 in/out, wrapping arithmetic."""
    x = np.asarray(x).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _U(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
        return x ^ (x >> _U(31))


def _seed_mix(h: np.ndarray, seed: int) -> np.ndarray:
    if seed == 0:
        return h
    with np.errstate(over="ignore"):
        return splitmix64(h ^ splitmix64(np.array([seed], dtype=np.uint64))[0])


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of a 1-D array (ints, floats, or strings)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return _seed_mix(splitmix64(arr.astype(np.int64).view(np.uint64)), seed)
    if arr.dtype.kind == "f":
        return _seed_mix(splitmix64(arr.astype(np.float64).view(np.uint64)), seed)
    # strings / objects: pandas hash_array (SipHash, fixed default key)
    h = pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)
    return _seed_mix(h.astype(np.uint64), seed)


def combine_hashes(columns: list[np.ndarray], seed: int = 0) -> np.ndarray:
    """Hash a k-tuple key given per-column uint64 hashes (order-sensitive)."""
    acc = np.full(len(columns[0]), _U(0x9E3779B97F4A7C15), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in columns:
            acc = splitmix64(acc ^ np.asarray(c, dtype=np.uint64))
    return _seed_mix(acc, seed)


def bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 -> 0)."""
    w = np.asarray(w, dtype=np.uint64)
    hi = (w >> _U(32)).astype(np.int64)
    lo = (w & _U(0xFFFFFFFF)).astype(np.int64)

    def _bl32(v: np.ndarray) -> np.ndarray:
        out = np.zeros(v.shape, dtype=np.int64)
        nz = v > 0
        # values < 2^32 are exactly representable in float64; floor(log2) exact
        out[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        return out

    return np.where(hi > 0, 32 + _bl32(hi), _bl32(lo))
