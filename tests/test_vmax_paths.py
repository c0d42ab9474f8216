"""The vmax fast path (caller-supplied key bound, sketches/cms.py) must be
byte-equivalent to the scan path in every regime: packed/unpackable bit
widths, bincount/sort/direct folding ladders, and the overflow
pre-reduction."""

import numpy as np
import pytest

from epichypersketch_jl_spark.sketches.cms import CountMinSketch


def _pair(seed=7, **kw):
    mk = lambda: CountMinSketch(delta=0.01, epsilon=1e-3, key_width=3, seed=seed, **kw)
    return mk(), mk()


@pytest.mark.parametrize("hi,vmax", [
    (2000, 1999),      # packed, bincount-eligible widths
    (2000, 4095),      # looser bound: wider bits, same counts
    (1 << 25, (1 << 25)),   # packed but beyond BINCOUNT_BITS: sort ladder
    (1 << 62, 1 << 62),     # unpackable: direct path + pre-reduction
])
def test_update_and_estimate_equivalence(hi, vmax):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, hi, size=(60_000, 3))
    a, b = _pair()
    a.update_batch_grouped(keys, vmax=vmax)
    b.update_batch_grouped(keys)
    assert a == b and a.n_updates == b.n_updates
    assert (a.estimate_grouped(keys, vmax=vmax) == b.estimate_grouped(keys)).all()
    assert (a.estimate(keys[:100], vmax=vmax) == b.estimate(keys[:100])).all()


def test_conservative_update_equivalence():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 500, size=(20_000, 3))
    a, b = _pair(conservative=True)
    a.update_batch(keys, vmax=499)
    b.update_batch(keys)
    assert a == b


def test_repetitive_stream_fold_path():
    # low-cardinality stream engages the fold-first branch of the ladder
    keys = np.tile(np.arange(12, dtype=np.int64).reshape(4, 3), (5000, 1))
    a, b = _pair()
    a.update_batch_grouped(keys, vmax=11)
    b.update_batch_grouped(keys)
    assert a == b
