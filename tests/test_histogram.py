"""Exact histograms: bucket-law correctness, clamping, null discipline,
and the single-aggregate plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.errors import InputError
from epichypersketch_jl_spark.operators.histogram import value_histogram


class TestHistogram:
    def test_log2_buckets_exact(self, spark):
        vals = [1, 1, 2, 3, 4, 7, 8, 1023, 1024, 0, -3, None]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        rows = value_histogram(df, "v", mode="log2").collect()
        got = {r.bucket: (r.bucket_lo, r.bucket_hi, r.n_values) for r in rows}
        # 0, -3, NULL excluded; [1,2):2, [2,4):2, [4,8):2, [8,16):1,
        # [512,1024):1, [1024,2048):1
        assert got == {
            0: (1, 2, 2),
            1: (2, 4, 2),
            2: (4, 8, 2),
            3: (8, 16, 1),
            9: (512, 1024, 1),
            10: (1024, 2048, 1),
        }

    def test_log2_matches_numpy_on_random(self, spark):
        rng = np.random.default_rng(5)
        vals = rng.integers(1, 1 << 20, size=5000)
        df = spark.createDataFrame([(int(v),) for v in vals], "v long").repartition(6)
        rows = value_histogram(df, "v", mode="log2").collect()
        want = {}
        for b in np.floor(np.log2(vals)).astype(int):
            want[int(b)] = want.get(int(b), 0) + 1
        assert {r.bucket: r.n_values for r in rows} == want

    def test_linear_clamping_and_groups(self, spark):
        df = spark.createDataFrame(
            [("g", v) for v in [-10, 0, 9, 10, 19, 39, 40, 1000]],
            "grp string, v long",
        )
        rows = value_histogram(
            df, "v", group_col="grp", mode="linear", lo=0, width=10, n_buckets=4
        ).collect()
        got = {r.bucket: r.n_values for r in rows}
        assert got == {0: 3, 1: 2, 3: 3}  # -10 clamps low; 40,1000 clamp high
        assert all(r.grp == "g" for r in rows)

    def test_guards(self, spark):
        df = spark.createDataFrame([(1,)], "v long")
        with pytest.raises(InputError):
            value_histogram(df, "nope")
        with pytest.raises(InputError):
            value_histogram(df, "v", mode="cubic")
        with pytest.raises(InputError):
            value_histogram(df, "v", mode="linear", width=0)

    def test_single_aggregate_plan(self, spark):
        df = spark.range(100).select(F.col("id").alias("v"))
        plan = (
            value_histogram(df, "v", mode="log2")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Join" not in plan, plan

    def test_linear_integer_exact_beyond_double_precision(self, spark):
        """ADVICE r4: values with |v - lo| >= 2^53 must bucket by TRUE
        integer floor division (double division rounds across boundaries).
        v = 2^60 + 1 with width 2^60: exact floor((2^60+1)/2^60) = 1, but
        (2^60+1)/2^60 in doubles is exactly 1.0 only by rounding — pick a
        case where the double quotient rounds UP across the boundary:
        v = 2^60 - 1, width 2^60 -> floor = 0, double (2^60-1)/2^60
        rounds to 1.0 and floor() of it would give bucket 1."""
        w = 1 << 60
        df = spark.createDataFrame([(w - 1,), (w + 1,), (-(w - 1),)], "v long")
        rows = value_histogram(
            df, "v", mode="linear", lo=0, width=w, n_buckets=4
        ).collect()
        got = {r.bucket: r.n_values for r in rows}
        # w-1 -> bucket 0; w+1 -> bucket 1; -(w-1) -> floor = -1, clamps to 0
        assert got == {0: 2, 1: 1}
