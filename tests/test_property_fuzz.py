"""Hypothesis property fuzz: merge algebra and never-undercount hold for
arbitrary key streams and arbitrary re-chunkings (SURVEY.md §5 plan item 2,
generalized beyond the fixed-seed cases)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from epichypersketch_jl_spark.sketches import BloomFilter, CountMinSketch, HyperLogLog

_settings = settings(
    max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

keys_strategy = st.lists(
    st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1)),
    min_size=0,
    max_size=400,
)


@_settings
@given(keys=keys_strategy, cut=st.integers(0, 400), seed=st.integers(0, 2**31 - 1))
def test_cms_chunk_invariance_and_never_undercount(keys, cut, seed):
    arr = np.array(keys, dtype=np.int64).reshape(-1, 2)
    whole = CountMinSketch(delta=0.05, epsilon=0.01, key_width=2, seed=seed)
    whole.update_batch_grouped(arr)

    cut = min(cut, len(arr))
    a = CountMinSketch(delta=0.05, epsilon=0.01, key_width=2, seed=seed)
    b = CountMinSketch(delta=0.05, epsilon=0.01, key_width=2, seed=seed)
    a.update_batch_grouped(arr[:cut])
    b.update_batch(arr[cut:])  # mixed grouped/direct paths must agree
    assert a.merge(b) == whole

    if len(arr):
        uniq, counts = np.unique(arr, axis=0, return_counts=True)
        assert (whole.estimate(uniq) >= counts).all()


@_settings
@given(
    keys=keys_strategy,
    cut=st.integers(0, 400),
    seed=st.integers(0, 2**31 - 1),
)
def test_cms_conservative_never_undercounts_any_split(keys, cut, seed):
    arr = np.array(keys, dtype=np.int64).reshape(-1, 2)
    cut = min(cut, len(arr))
    a = CountMinSketch(delta=0.05, epsilon=0.01, key_width=2, seed=seed, conservative=True)
    b = CountMinSketch(delta=0.05, epsilon=0.01, key_width=2, seed=seed, conservative=True)
    a.update_batch(arr[:cut])
    b.update_batch(arr[cut:])
    merged = a.merge(b)
    if len(arr):
        uniq, counts = np.unique(arr, axis=0, return_counts=True)
        assert (merged.estimate(uniq) >= counts).all()


@_settings
@given(
    vals=st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=500),
    cut=st.integers(0, 500),
)
def test_hll_merge_equals_whole(vals, cut):
    arr = np.array(vals, dtype=np.int64)
    cut = min(cut, len(arr))
    whole = HyperLogLog(p=8, seed=3)
    whole.update_batch(arr)
    a, b = HyperLogLog(p=8, seed=3), HyperLogLog(p=8, seed=3)
    a.update_batch(arr[:cut])
    b.update_batch(arr[cut:])
    assert np.array_equal(a.merge(b).regs, whole.regs)


@_settings
@given(
    vals=st.lists(st.integers(0, 2**40), min_size=0, max_size=300),
    cut=st.integers(0, 300),
)
def test_bloom_union_no_false_negatives(vals, cut):
    arr = np.array(vals, dtype=np.int64)
    cut = min(cut, len(arr))
    a = BloomFilter(n_expected=1000, fpp=0.01, seed=5)
    b = BloomFilter(n_expected=1000, fpp=0.01, seed=5)
    a.update_batch(arr[:cut])
    b.update_batch(arr[cut:])
    m = a.merge(b)
    if len(arr):
        assert m.contains(arr).all()


@given(
    L=st.integers(min_value=1, max_value=26),
    k=st.integers(min_value=1, max_value=4),
    max_cells=st.integers(min_value=1, max_value=20000),
)
@settings(max_examples=60, deadline=None)
def test_fuzz_comb_chunks_cover_exactly_once(L, k, max_cells):
    """Any (L, k, max_cells): concatenated chunks == the full lexicographic
    combination matrix, with no duplicates or gaps."""
    from math import comb

    from epichypersketch_jl_spark.functions.combinations import (
        comb_index_matrix,
        iter_comb_chunks,
    )

    chunks = list(iter_comb_chunks(L, k, max_cells))
    if k > L:
        assert chunks == []
        return
    got = np.concatenate(chunks) if chunks else np.empty((0, k), dtype=np.int64)
    assert got.shape[0] == comb(L, k)
    assert np.array_equal(got, comb_index_matrix(L, k))


@given(
    L=st.integers(1, 40),
    k=st.integers(1, 6),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_fuzz_unrank_matches_itertools(L, k, data):
    """comb_unrank_lex(L, k, ranks) == the rank-indexed rows of the
    itertools enumeration, for arbitrary (possibly unsorted,
    non-contiguous, duplicated) rank subsets."""
    from itertools import combinations
    from math import comb

    from epichypersketch_jl_spark.functions.combinations import comb_unrank_lex

    if k > L:
        return
    total = comb(L, k)
    ranks = data.draw(
        st.lists(st.integers(0, total - 1), min_size=0, max_size=50)
    )
    got = comb_unrank_lex(L, k, np.array(ranks, dtype=np.int64))
    full = list(combinations(range(L), k))
    want = np.array([full[r] for r in ranks], dtype=np.int64).reshape(len(ranks), k)
    assert np.array_equal(got, want)


@_settings
@given(
    keys=keys_strategy,
    slack=st.integers(0, 2**32),
    seed=st.integers(0, 2**31 - 1),
)
def test_cms_vmax_path_equals_scan_path(keys, slack, seed):
    """Any caller-supplied bound >= the true max (with arbitrary slack)
    must leave update_batch_grouped / estimate_grouped byte-identical to
    the scanning path — across the bincount/sort/direct ladder branches
    the bound's bit-width selects."""
    arr = np.asarray(keys, dtype=np.int64).reshape(-1, 2)
    vmax = (int(arr.max()) if arr.size else 0) + slack
    a = CountMinSketch(delta=0.01, epsilon=0.01, key_width=2, seed=seed)
    b = CountMinSketch(delta=0.01, epsilon=0.01, key_width=2, seed=seed)
    a.update_batch_grouped(arr, vmax=vmax)
    b.update_batch_grouped(arr)
    assert a == b and a.n_updates == b.n_updates
    if arr.size:
        assert (a.estimate_grouped(arr, vmax=vmax) == b.estimate_grouped(arr)).all()
