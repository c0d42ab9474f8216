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
