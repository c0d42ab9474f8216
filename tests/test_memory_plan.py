"""Memory planner tests (port of test/test_memory_management.jl:26-60:
estimates positive, batch size within clamps under explicit budgets)."""

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.plans.memory import (
    MAX_BATCH_ROWS,
    MIN_BATCH_ROWS,
    estimate_bytes_per_doc,
    estimate_fixed_bytes,
    plan_memory,
)


class TestMemoryPlanner:
    def test_estimates_positive_and_monotone(self):
        cfg = HyperSketchConfig(motif_size=3, min_count=1)
        assert estimate_fixed_bytes(cfg) > 0
        b20 = estimate_bytes_per_doc(cfg, 20)
        b60 = estimate_bytes_per_doc(cfg, 60)
        assert 0 < b20 < b60
        assert estimate_bytes_per_doc(cfg, 20, conv=True) > b20  # wider keys

    def test_batch_rows_within_clamps(self):
        cfg = HyperSketchConfig(motif_size=3, min_count=1)
        for budget in (16 * 2**20, 256 * 2**20, 8 * 2**30):
            plan = plan_memory(cfg, typical_len=50, budget_bytes=budget)
            assert MIN_BATCH_ROWS <= plan.arrow_batch_rows <= MAX_BATCH_ROWS
            assert 1000 <= plan.max_cells <= 32_000_000

    def test_tight_budget_shrinks_plan(self):
        cfg = HyperSketchConfig(motif_size=3, min_count=1)
        small = plan_memory(cfg, typical_len=80, budget_bytes=16 * 2**20)
        big = plan_memory(cfg, typical_len=80, budget_bytes=2 * 2**30)
        assert small.max_cells <= big.max_cells
        assert small.arrow_batch_rows <= big.arrow_batch_rows


class TestPlannerWiring:
    """VERDICT fix: plan_memory is consulted by the pipeline when a budget
    is set (was dead code on static DEFAULT_MAX_CELLS)."""

    def test_planned_config_resolves_max_cells(self, spark):
        from epichypersketch_jl_spark.plans.memory import (
            BYTES_PER_CELL,
            observed_typical_len,
            planned_config,
        )

        df = spark.createDataFrame(
            [(i, list(range(1, 30)), 29) for i in range(40)],
            "doc_id: long, tokens: array<int>, n_tok: int",
        )
        budget = 64 * 2**20
        cfg = HyperSketchConfig(motif_size=2, min_count=1, memory_budget_bytes=budget)
        planned = planned_config(df, cfg, conv=False)
        assert planned.memory_budget_bytes is None  # resolved exactly once
        assert planned.max_cells != cfg.max_cells or planned.max_cells >= 1000
        # the planner's cap respects the byte budget
        assert planned.max_cells * BYTES_PER_CELL <= budget
        assert observed_typical_len(df, cfg) == 29

    def test_no_budget_is_identity(self, spark):
        from epichypersketch_jl_spark.plans.memory import planned_config

        df = spark.createDataFrame([(1, [1, 2], 2)], "doc_id: long, tokens: array<int>, n_tok: int")
        cfg = HyperSketchConfig(motif_size=2, min_count=1)
        assert planned_config(df, cfg, conv=False) is cfg

    def test_results_identical_under_budget(self, spark, sf_dir):
        from epichypersketch_jl_spark.operators.motif import motif_counts
        from epichypersketch_jl_spark.sources.tables import tokenized_sequences

        seq = tokenized_sequences(spark, sf_dir)
        base = motif_counts(
            seq, HyperSketchConfig(motif_size=2, min_count=40, seed=42)
        ).toPandas()
        budgeted = motif_counts(
            seq,
            HyperSketchConfig(
                motif_size=2, min_count=40, seed=42, memory_budget_bytes=32 * 2**20
            ),
        ).toPandas()
        cols = ["m1", "m2", "count", "n_occurrences", "total_contribution"]
        a = base[cols].sort_values(["m1", "m2"]).reset_index(drop=True)
        b = budgeted[cols].sort_values(["m1", "m2"]).reset_index(drop=True)
        assert a.equals(b)
