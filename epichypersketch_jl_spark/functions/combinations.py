"""Vectorized k-combination enumeration over ragged token arrays.

The reference materializes one dense `combs` matrix of ALL C(max_len, k)
index subsets and runs every sequence against it, padding short rows with 0
and masking invalid slots in-kernel (src/record.jl:196-205, 159;
src/count_gpu.jl:4-16).  We instead group rows by their true length L inside
each Arrow batch and enumerate exactly C(L, k) per row — strictly less work,
no padding, no validity predicate (SURVEY.md §4 "zero-padding" row).

`max_cells` caps rows_per_chunk * C(L,k) * k, the peak gather size — the
Spark-side stand-in for the reference's memory planner (src/memory.jl:97-148).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import chain, combinations
from math import comb

import numpy as np


@lru_cache(maxsize=4096)
def comb_index_matrix(L: int, k: int) -> np.ndarray:
    """All k-subsets of range(L) as a (C(L,k), k) int64 matrix, lexicographic.

    Mirrors the reference's generate_combinations (src/record.jl:196-205) but
    0-based and generated lazily per distinct length.
    """
    if k > L or k < 1:
        return np.empty((0, max(k, 1)), dtype=np.int64)
    c = comb(L, k)
    out = np.fromiter(
        chain.from_iterable(combinations(range(L), k)), dtype=np.int64, count=c * k
    )
    return out.reshape(c, k)


HARD_MAX_CELLS = 32_000_000  # absolute per-chunk ceiling (~0.75 GB of i32 keys)
MIN_ROWS_PER_CHUNK = 16  # amortize the ~40 numpy calls a chunk costs


def iter_length_groups(lengths: np.ndarray, k: int, max_cells: int):
    """Yield (row_indices, L) chunks, grouping rows by identical length.

    Rows shorter than k are skipped (they admit no k-combination — the
    reference's empty-sequence filter generalized, src/record.jl:248-252).
    Chunks target len(rows) * C(L,k) * k <= max_cells (cache-residency of
    the kernel streams), but never fewer than MIN_ROWS_PER_CHUNK rows while
    under HARD_MAX_CELLS — single-row chunks at large C(L,k) drown in
    per-chunk Python overhead (measured 9x on k=3, L~99).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    order = np.argsort(lengths, kind="stable")
    sl = lengths[order]
    # boundaries of equal-length runs
    starts = np.flatnonzero(np.concatenate([[True], sl[1:] != sl[:-1]]))
    ends = np.concatenate([starts[1:], [len(sl)]])
    for s, e in zip(starts, ends):
        L = int(sl[s])
        if L < k:
            continue
        cells_per_row = max(1, comb(L, k) * k)
        rows_per_chunk = max_cells // cells_per_row
        if rows_per_chunk < MIN_ROWS_PER_CHUNK:
            hard = max(max_cells, HARD_MAX_CELLS)
            rows_per_chunk = max(1, min(MIN_ROWS_PER_CHUNK, hard // cells_per_row))
        rows = order[s:e]
        for i in range(0, len(rows), rows_per_chunk):
            yield rows[i : i + rows_per_chunk], L


def gather_rows(flat: np.ndarray, offsets: np.ndarray, rows: np.ndarray, L: int) -> np.ndarray:
    """Dense (len(rows), L) matrix for rows known to all have length L."""
    starts = offsets[rows]
    return flat[starts[:, None] + np.arange(L, dtype=np.int64)[None, :]]
