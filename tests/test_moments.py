"""AMS F2 sketch: estimator accuracy, partition invariance, null
discipline, and the single-aggregate plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.errors import InputError
from epichypersketch_jl_spark.operators.moments import ams_f2


def _exact_f2(values) -> int:
    _, c = np.unique(np.asarray(values), return_counts=True)
    return int((c.astype(np.int64) ** 2).sum())


class TestAmsF2:
    def test_estimate_tracks_exact(self, spark):
        rng = np.random.default_rng(3)
        vals = rng.zipf(1.7, size=20_000).astype(np.int64)
        vals = vals[vals < 10_000]
        df = spark.createDataFrame([(int(v),) for v in vals], "v long").repartition(8)
        (row,) = ams_f2(df, "v", d=8).collect()
        exact = _exact_f2(vals)
        assert row.n_values == len(vals)
        # median-of-8 AMS: generous 3x factor bound (E[S^2] = F2, the
        # median tames the chi-square tail)
        assert exact / 3 <= row.f2_est <= exact * 3, (row.f2_est, exact)

    def test_constant_column_is_n_squared(self, spark):
        # one distinct value: S_r = +/-n exactly, so every estimate is n^2
        n = 500
        df = spark.createDataFrame([(7,)] * n, "v long")
        (row,) = ams_f2(df, "v", d=4).collect()
        assert row.f2_est == n * n

    def test_partition_invariance_and_grouped(self, spark):
        rows = [(f"g{i % 3}", i % 50) for i in range(3000)]
        df = spark.createDataFrame(rows, "g string, v long")
        a = {r.g: (r.f2_est, tuple(r[f"s_{i}"] for i in range(6)))
             for r in ams_f2(df.repartition(2), "v", group_col="g", d=6).collect()}
        b = {r.g: (r.f2_est, tuple(r[f"s_{i}"] for i in range(6)))
             for r in ams_f2(df.repartition(17), "v", group_col="g", d=6).collect()}
        # identical sketch state and estimate under any partitioning —
        # the associative-merge property (componentwise integer sums)
        assert a == b and len(a) == 3

    def test_array_and_null_discipline(self, spark):
        df = spark.createDataFrame(
            [("a", [1, None, 1]), ("a", None), ("a", [2])],
            "g string, xs array<int>",
        )
        (row,) = ams_f2(df, "xs", group_col="g", d=4).collect()
        assert row.n_values == 3  # two 1s + one 2; nulls dropped
        # deterministic numpy replication of the sign hash (kmv parity)
        from epichypersketch_jl_spark.operators.moments import SALT_STRIDE
        from epichypersketch_jl_spark.sketches.kmv import kmv_hash

        vals = np.array([1, 1, 2], dtype=np.int64)
        ss = sorted(
            int(np.sum(1 - 2 * (kmv_hash(vals + r * SALT_STRIDE) % 2)) ** 2)
            for r in range(4)
        )
        assert row.f2_est == ss[1]  # lower median of d=4

    def test_empty_and_guards(self, spark):
        empty = spark.createDataFrame([], "v long")
        (row,) = ams_f2(empty, "v", d=4).collect()
        assert row.n_values == 0 and row.f2_est == 0
        with pytest.raises(InputError):
            ams_f2(empty, "v", d=0)
        with pytest.raises(InputError):
            ams_f2(empty, "nope")

    def test_join_size_tracks_exact(self, spark):
        from epichypersketch_jl_spark.operators.moments import ams_join_size

        rng = np.random.default_rng(2)
        av = rng.zipf(1.6, size=8000)
        av = av[av < 3000]
        bv = rng.zipf(1.6, size=8000)
        bv = bv[bv < 3000]
        da = spark.createDataFrame([(int(v),) for v in av], "k long").repartition(5)
        db = spark.createDataFrame([(int(v),) for v in bv], "k long").repartition(3)
        (row,) = ams_join_size(da, "k", db, "k", d=8).collect()
        ua, ca = np.unique(av, return_counts=True)
        ub, cb = np.unique(bv, return_counts=True)
        common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
        exact = int((ca[ia].astype(np.int64) * cb[ib]).sum())
        assert row.n_a == len(av) and row.n_b == len(bv)
        assert exact / 3 <= row.join_size_est <= exact * 3, (row.join_size_est, exact)

    def test_join_size_disjoint_keys_near_zero(self, spark):
        from epichypersketch_jl_spark.operators.moments import ams_join_size

        da = spark.createDataFrame([(i,) for i in range(500)], "k long")
        db = spark.createDataFrame([(i,) for i in range(10_000, 10_500)], "k long")
        (row,) = ams_join_size(da, "k", db, "k", d=8).collect()
        # true join size 0: the median product must be sub-noise, far
        # from the n_a*n_b = 250k a real overlap would produce
        assert abs(row.join_size_est) < 50_000

    def test_single_aggregate_plan(self, spark):
        """The sketch is one aggregate: exactly one shuffle (the final
        partial-sum exchange), no join, no groupBy on values."""
        df = spark.range(1000).select(F.col("id").alias("v"))
        plan = ams_f2(df, "v", d=4)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1, plan
        assert "Join" not in plan, plan


class TestOverflowGuard:
    def test_f2_null_when_sums_exceed_safe_bound(self, spark, monkeypatch):
        """ADVICE r4: past |S_r| ~ 3e9 the square wraps silently; the
        estimate must come back NULL, never garbage.  The bound is
        monkeypatched tiny so a 50-row frame can cross it."""
        import epichypersketch_jl_spark.operators.moments as M

        df = spark.createDataFrame([(7,)] * 50, "v long")  # all same value:
        # every S_r = +-50, squares fine normally
        (ok,) = M.ams_f2(df, "v", d=3).collect()
        assert ok.f2_est == 2500
        monkeypatch.setattr(M, "SQUARE_SAFE_ABS", 10)
        (row,) = M.ams_f2(df, "v", d=3).collect()
        assert row.f2_est is None
        assert row.s_0 is not None  # sketch state still emitted for merges

    def test_join_size_null_when_unsafe(self, spark, monkeypatch):
        import epichypersketch_jl_spark.operators.moments as M

        da = spark.createDataFrame([(3,)] * 40, "k long")
        db = spark.createDataFrame([(3,)] * 30, "k long")
        (ok,) = M.ams_join_size(da, "k", db, "k", d=3).collect()
        assert ok.join_size_est == 1200
        monkeypatch.setattr(M, "SQUARE_SAFE_ABS", 5)
        (row,) = M.ams_join_size(da, "k", db, "k", d=3).collect()
        assert row.join_size_est is None
