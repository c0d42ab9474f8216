"""Vectorized k-combination enumeration over ragged token arrays.

The reference materializes one dense `combs` matrix of ALL C(max_len, k)
index subsets and runs every sequence against it, padding short rows with 0
and masking invalid slots in-kernel (src/record.jl:196-205, 159;
src/count_gpu.jl:4-16).  We instead group rows by their true length L inside
each Arrow batch and enumerate exactly C(L, k) per row — strictly less work,
no padding, no validity predicate (SURVEY.md §4 "zero-padding" row).

`max_cells` caps rows_per_chunk * C(L,k) * k, the peak gather size — the
Spark-side stand-in for the reference's memory planner (src/memory.jl:97-148).
For pathologically long sequences (web text: a single L~1000 doc at k=3 is
~5e8 index cells, a guaranteed worker OOM if materialized at once) the
combination space itself is enumerated in bounded slices via
`iter_comb_chunks`; `comb_index_matrix` — the materialize-everything API —
refuses above a hard ceiling instead of dying in malloc.
"""

from __future__ import annotations

from collections import OrderedDict
from math import comb

import numpy as np

from ..errors import InputError


def _binom_vec(n: np.ndarray, j: int) -> np.ndarray:
    """Exact vectorized C(n, j) for int64 n >= -1 and small j (n < j -> 0).
    The running product after step i is exactly C(n, i+1) (binomial
    recurrence), so every intermediate is an exact int64 for the L ranges
    the materialization ceiling admits."""
    n = np.asarray(n, dtype=np.int64)
    res = np.ones_like(n)
    for i in range(j):
        res = res * (n - i) // (i + 1)
    return np.where(n >= j, res, 0)


def comb_unrank_lex(L: int, k: int, ranks: np.ndarray) -> np.ndarray:
    """Vectorized lexicographic unranking: row r is the r-th k-subset of
    range(L) in lex order, for every rank in `ranks` at once.

    Column by column: with `slots` elements left to choose after previous
    value p, the number of completions whose next value is >= v is the
    hockey-stick sum C(L-v, slots), which is decreasing in v — so the next
    value is one searchsorted over a length-L table shared by all rows.
    O(k · n log L) numpy work, no per-combination Python.  (Replaces an
    itertools.combinations + np.fromiter generator that was 92% of the
    k=4 kernel profile: the Python iterator produced ~3M tuples/s while
    everything downstream was vectorized.)
    """
    # int64 addressability guard: the largest _binom_vec intermediate is
    # exactly C(L,k)*k (the last multiply before its dividing step), and
    # ranks themselves are int64 — beyond 2^62 the tables would silently
    # wrap and every chunk would be garbage.  A space that size is also
    # centuries of enumeration, so an explicit error is the right answer.
    if comb(L, k) * k >= 2**62:
        raise InputError(
            f"C({L},{k})*{k} combination cells exceed int64 unranking range"
        )
    ranks = np.asarray(ranks, dtype=np.int64)
    n = len(ranks)
    # int32 output: combination indices are < L, and halving the bytes
    # halves both the memo footprint and the first-touch page-fault cost
    # of fresh matrices (the dominant generation cost on THP-heavy hosts)
    out = np.empty((n, k), dtype=np.int32)
    # per-column lookup tables: A_j[v] = C(L - v, slots_j), strictly
    # decreasing — completion counts become table gathers (remaining after
    # previous value p is A[p+1]; completions at the chosen v is A[v])
    tables = []
    for j in range(k):
        slots = k - j
        vs = np.arange(L - slots + 2, dtype=np.int64)
        A = _binom_vec(L - vs, slots)
        tables.append((A, -A[:-1]))
    # block the ranks so temporaries stay ~2 MB: large fresh numpy
    # temporaries cross the malloc mmap threshold and first-touch page
    # faults dominate (measured 30x on C(100,4)-sized single-shot arrays)
    block = 262_144
    for s in range(0, n, block):
        r = ranks[s : s + block].copy()
        p = np.full(len(r), -1, dtype=np.int64)
        for j in range(k):
            A, negA = tables[j]
            tot = A[p + 1]
            t = tot - r
            v = np.searchsorted(negA, -t, side="right") - 1  # last v: A[v] >= t
            r -= tot - A[v]
            out[s : s + block, j] = v
            p = v
    return out

# materialize-at-once ceiling for one combs matrix (cells = C(L,k) * k);
# 64M int64 cells = 512 MB — beyond this, enumeration must be chunked
COMB_MATRIX_MAX_CELLS = 64_000_000
# total bytes the comb-matrix memo may pin (FIFO-evicted beyond this)
COMB_CACHE_MAX_BYTES = 256 * 1024 * 1024

_cache: OrderedDict[tuple[int, int], np.ndarray] = OrderedDict()
_cache_bytes = 0


def comb_index_matrix(L: int, k: int) -> np.ndarray:
    """All k-subsets of range(L) as a (C(L,k), k) int32 matrix, lexicographic.

    Mirrors the reference's generate_combinations (src/record.jl:196-205) but
    0-based and generated lazily per distinct length.  Memoized with a
    byte-bounded FIFO cache (an unbounded entry-count cache could pin
    hundreds of GB across many distinct lengths).  Raises InputError above
    COMB_MATRIX_MAX_CELLS — callers enumerating long sequences must use
    iter_comb_chunks instead.
    """
    global _cache_bytes
    if k > L or k < 1:
        return np.empty((0, max(k, 1)), dtype=np.int32)
    key = (L, k)
    hit = _cache.get(key)
    if hit is not None:
        _cache.move_to_end(key)
        return hit
    c = comb(L, k)
    if c * k > COMB_MATRIX_MAX_CELLS:
        raise InputError(
            f"C({L},{k})*{k} = {c * k} combination cells exceeds the "
            f"{COMB_MATRIX_MAX_CELLS} materialization ceiling; "
            "use iter_comb_chunks for bounded enumeration"
        )
    out = comb_unrank_lex(L, k, np.arange(c, dtype=np.int64))
    out.setflags(write=False)
    _cache[key] = out
    _cache_bytes += out.nbytes
    while _cache_bytes > COMB_CACHE_MAX_BYTES and len(_cache) > 1:
        _, old = _cache.popitem(last=False)
        _cache_bytes -= old.nbytes
    return out


def iter_comb_chunks(L: int, k: int, max_cells: int):
    """Yield (n_combs_chunk, k) index matrices covering all C(L,k) subsets,
    each bounded by ~max_cells int64 cells — constant memory regardless of
    L.  The common case (everything fits) yields the single memoized matrix,
    so the fast path is identical to comb_index_matrix.  Under the
    materialization ceiling, chunks are zero-copy SLICES of the memoized
    matrix; combination spaces too large to ever materialize are unranked
    in bounded rank windows (comb_unrank_lex), so no path re-enumerates
    from scratch per kernel row-chunk."""
    if k > L or k < 1:
        return
    total_cells = comb(L, k) * k
    rows_per = max(1024, max_cells // max(k, 1))
    if total_cells <= min(max_cells, COMB_MATRIX_MAX_CELLS):
        yield comb_index_matrix(L, k)
        return
    if total_cells <= COMB_MATRIX_MAX_CELLS:
        m = comb_index_matrix(L, k)
        for i in range(0, m.shape[0], rows_per):
            yield m[i : i + rows_per]
        return
    # combination spaces too large to ever materialize: unrank bounded
    # rank windows directly (vectorized, constant memory)
    total = comb(L, k)
    for i in range(0, total, rows_per):
        yield comb_unrank_lex(L, k, np.arange(i, min(i + rows_per, total)))


HARD_MAX_CELLS = 32_000_000  # absolute per-chunk ceiling (~0.75 GB of i32 keys)
MIN_ROWS_PER_CHUNK = 16  # amortize the ~40 numpy calls a chunk costs


def iter_length_groups(lengths: np.ndarray, k: int, max_cells: int):
    """Yield (row_indices, L) chunks, grouping rows by identical length.

    Rows shorter than k are skipped (they admit no k-combination — the
    reference's empty-sequence filter generalized, src/record.jl:248-252).
    Chunks target len(rows) * C(L,k) * k <= max_cells (cache-residency of
    the kernel streams), but never fewer than MIN_ROWS_PER_CHUNK rows while
    under HARD_MAX_CELLS — single-row chunks at large C(L,k) drown in
    per-chunk Python overhead (measured 9x on k=3, L~99).  Rows whose
    per-row combination space alone exceeds every cap still come through
    (one row per chunk); the kernels then slice the combination space via
    iter_comb_chunks.
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


def comb_chunk_cells(n_rows: int, max_cells: int, k: int) -> int:
    """Per-row combination-cell budget for a kernel chunk of n_rows rows:
    the chunk's total stream stays near max_cells even when one row's full
    C(L,k) space wouldn't fit."""
    return max(k * 1024, max_cells // max(n_rows, 1))


def gather_rows(flat: np.ndarray, offsets: np.ndarray, rows: np.ndarray, L: int) -> np.ndarray:
    """Dense (len(rows), L) matrix for rows known to all have length L."""
    starts = offsets[rows]
    return flat[starts[:, None] + np.arange(L, dtype=np.int64)[None, :]]
