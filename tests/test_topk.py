"""Misra-Gries approximate top-k: bounds, completeness, invariance.

The operator's contract (operators/topk.py) is pinned under adversarial
partitionings: estimates never overcount, the undercount is capped by the
emitted err_bound (itself <= N_group/(m+1)), and every value heavier than
N_group/(m+1) appears in the full summary — for numeric, string, and
array-valued columns alike.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.errors import InputError
from epichypersketch_jl_spark.operators.topk import approx_topk


def _zipf_rows(n_groups=3, n_vals=120, scale=400, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        for v in range(n_vals):
            c = max(1, int(scale / (v + 1)))
            rows += [(f"g{g}", int(v))] * c
    order = rng.permutation(len(rows))
    return [rows[i] for i in order]


@pytest.fixture(scope="module")
def zipf_df(spark):
    return spark.createDataFrame(_zipf_rows(), "grp string, val long").cache()


def _exact(df, group=True):
    key = ["grp", "val"] if group else ["val"]
    return {
        tuple(r[k] for k in key): r["c"]
        for r in df.groupBy(*key).agg(F.count("*").alias("c")).collect()
    }


class TestBounds:
    @pytest.mark.parametrize("parts", [1, 3, 16])
    def test_bounds_hold_under_any_partitioning(self, spark, zipf_df, parts):
        df = zipf_df.repartition(parts)
        exact = _exact(df)
        totals = {}
        for (g, _v), c in exact.items():
            totals[g] = totals.get(g, 0) + c
        m = 24
        summ = approx_topk(df, "val", k=None, n_counters=m, group_col="grp")
        seen = set()
        for r in summ.collect():
            key = (r["grp"], r["item"])
            seen.add(key)
            assert r["est_count"] <= exact[key], "MG must never overcount"
            assert exact[key] - r["est_count"] <= r["err_bound"]
            assert r["err_bound"] <= totals[r["grp"]] // (m + 1)
        # completeness: every value heavier than N_g/(m+1) is in the summary
        for (g, v), c in exact.items():
            if c * (m + 1) > totals[g]:
                assert (g, v) in seen, f"heavy value ({g},{v}) missing"

    def test_truncation_engaged(self, spark, zipf_df):
        # 120 distinct values per group vs 24 counters: some estimate must
        # sit strictly below exact once slices truncate
        df = zipf_df.repartition(8)
        exact = _exact(df)
        summ = approx_topk(df, "val", k=None, n_counters=24, group_col="grp")
        assert any(r["est_count"] < exact[(r["grp"], r["item"])] for r in summ.collect())

    def test_exact_regime_matches_catalyst(self, spark, zipf_df):
        # n_counters >= distinct: no truncation anywhere, est == exact
        df = zipf_df.repartition(5)
        exact = _exact(df)
        summ = approx_topk(df, "val", k=None, n_counters=256, group_col="grp")
        rows = summ.collect()
        assert len(rows) == len(exact)
        for r in rows:
            assert r["est_count"] == exact[(r["grp"], r["item"])]
            assert r["err_bound"] == 0


class TestShapes:
    def test_topk_rows_and_order(self, spark, zipf_df):
        out = approx_topk(zipf_df, "val", k=5, n_counters=64, group_col="grp").collect()
        assert len(out) == 15
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["grp"], []).append(r["est_count"])
        for ests in by_grp.values():
            assert ests == sorted(ests, reverse=True)

    def test_ungrouped_string_values(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), ("a",), ("c",), ("b",)], "w string"
        ).repartition(3)
        out = approx_topk(df, "w", k=2, n_counters=16)
        rows = out.collect()
        assert [(r["item"], r["est_count"]) for r in rows] == [("a", 3), ("b", 2)]
        assert out.columns == ["item", "est_count", "err_bound"]

    def test_array_values(self, spark):
        df = spark.createDataFrame(
            [("s1", [1, 2, 2]), ("s1", [2]), ("s2", [3, 3])],
            "src string, xs array<int>",
        )
        out = approx_topk(df, "xs", k=1, n_counters=8, group_col="src").collect()
        got = {(r["src"], r["item"]): r["est_count"] for r in out}
        assert got == {("s1", 2): 3, ("s2", 3): 2}

    def test_null_group_and_empty_input(self, spark):
        df = spark.createDataFrame([(None, 7), (None, 7), ("g", 8)], "grp string, val long")
        out = approx_topk(df, "val", k=5, n_counters=8, group_col="grp").collect()
        got = {(r["grp"], r["item"]): r["est_count"] for r in out}
        assert got == {("None", 7): 2, ("g", 8): 1}
        empty = spark.createDataFrame([], "grp string, val long")
        assert approx_topk(empty, "val", k=3, n_counters=8, group_col="grp").count() == 0

    def test_invalid_params(self, spark, zipf_df):
        with pytest.raises(InputError):
            approx_topk(zipf_df, "val", k=3, n_counters=0)
        with pytest.raises(InputError):
            approx_topk(zipf_df, "val", k=0, n_counters=8)
        with pytest.raises(InputError):
            approx_topk(zipf_df, "val", k=3, n_counters=8, map_rows_budget=0)


class TestNullDiscipline:
    """NULL values must never become items — not INT64_MIN for longs, not
    the string 'None', not array elements (matching kmv_sketch_per_group)."""

    def test_long_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [(7,), (None,), (7,), (None,), (8,)], "val long"
        ).repartition(2)
        rows = approx_topk(df, "val", k=None, n_counters=8).collect()
        got = {r["item"]: r["est_count"] for r in rows}
        assert got == {7: 2, 8: 1}
        assert np.iinfo(np.int64).min not in got

    def test_string_nulls_dropped(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "w string")
        rows = approx_topk(df, "w", k=None, n_counters=8).collect()
        assert {r["item"]: r["est_count"] for r in rows} == {"a": 2}

    def test_array_null_elements_dropped(self, spark):
        df = spark.createDataFrame(
            [("s", [1, None, 1]), ("s", None), ("s", [None])],
            "src string, xs array<int>",
        )
        rows = approx_topk(df, "xs", k=None, n_counters=8, group_col="src").collect()
        assert {(r["src"], r["item"]): r["est_count"] for r in rows} == {("s", 1): 2}


class TestBoundedMapMemory:
    """Verdict r3 item 1: a deliberately tiny map_rows_budget forces
    intermediate in-task truncations on a high-cardinality column; the MG
    guarantees (no overcount, err_bound caps undercount, heavy-value
    completeness) must survive them."""

    @pytest.mark.parametrize("budget", [1, 7, 64])
    def test_bounds_survive_tiny_budget(self, spark, budget):
        rng = np.random.default_rng(23)
        # high-cardinality tail + a few genuinely heavy values per group
        rows = []
        for g in range(2):
            heavy = [(f"g{g}", int(v)) for v in range(4) for _ in range(300)]
            tail = [(f"g{g}", int(v)) for v in rng.integers(100, 5000, size=1500)]
            rows += heavy + tail
        order = rng.permutation(len(rows))
        df = spark.createDataFrame(
            [rows[i] for i in order], "grp string, val long"
        ).repartition(3)
        exact = _exact(df)
        totals = {}
        for (g, _v), c in exact.items():
            totals[g] = totals.get(g, 0) + c
        m = 16
        summ = approx_topk(
            df, "val", k=None, n_counters=m, group_col="grp", map_rows_budget=budget
        )
        seen = set()
        for r in summ.collect():
            key = (r["grp"], r["item"])
            seen.add(key)
            assert r["est_count"] <= exact[key], "MG must never overcount"
            assert exact[key] - r["est_count"] <= r["err_bound"]
        for (g, v), c in exact.items():
            if c * (m + 1) > totals[g]:
                assert (g, v) in seen, f"heavy value ({g},{v}) missing"

    def test_string_dictionary_compaction(self, spark):
        # many distinct strings through a tiny budget: the in-task string
        # dictionary is compacted at each flush; results must stay correct
        rows = [(f"w{i % 500}",) for i in range(3000)] + [("hot",)] * 800
        rng = np.random.default_rng(5)
        order = rng.permutation(len(rows))
        df = spark.createDataFrame([rows[i] for i in order], "w string").repartition(2)
        out = approx_topk(df, "w", k=1, n_counters=8, map_rows_budget=16).collect()
        assert out[0]["item"] == "hot"
        assert out[0]["est_count"] <= 800
        assert 800 - out[0]["est_count"] <= out[0]["err_bound"]

    def test_budget_matches_unbudgeted_in_exact_regime(self, spark, zipf_df):
        # n_counters >= distinct values: truncations are no-ops even when
        # the budget forces them constantly, so est == exact
        df = zipf_df.repartition(4)
        exact = _exact(df)
        summ = approx_topk(
            df, "val", k=None, n_counters=256, group_col="grp", map_rows_budget=50
        )
        rows = summ.collect()
        assert len(rows) == len(exact)
        for r in rows:
            assert r["est_count"] == exact[(r["grp"], r["item"])]
            assert r["err_bound"] == 0
