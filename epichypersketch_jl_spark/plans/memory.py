"""Memory planner — the Spark analog of the reference's closed-form batch
sizing (src/memory.jl:9-31 estimate_memory_per_batch, :97-148
calculate_optimal_batch_size, :172-228 auto_configure_batch_size).

The reference sizes GPU batches against 80% of free device memory; here the
scarce resources are (a) the Python worker's peak kernel allocation per
chunk and (b) Arrow batch transfer size.  Spark's own memory management
covers the JVM side, so the planner only reasons about the numpy kernel:

    per-chunk bytes ~ rows * C(L,k) * key_width * (4 int32 keys
                      + 8 int64 hash row + 4 int32 idx) * d / key_width ...

conservatively simplified to BYTES_PER_CELL * cells, with the sketch table
and bincount scratch as the fixed part (cf. estimate_fixed_memory,
src/memory.jl:39-61).
"""

from __future__ import annotations

from dataclasses import dataclass
from math import comb

from ..config import HyperSketchConfig, cms_dims

# measured ceiling: int32 keys + int64 matmul out + int32 idx + temporaries,
# normalized per enumerated cell (= one key component)
BYTES_PER_CELL = 40
MIN_BATCH_ROWS = 10  # reference clamps batch_size to [10, 10000]
MAX_BATCH_ROWS = 100_000


@dataclass(frozen=True)
class MemoryPlan:
    fixed_bytes: int  # sketch table + per-row bincount scratch
    bytes_per_doc: int  # kernel streams for one typical document
    max_cells: int  # chunk cap honoring the budget
    arrow_batch_rows: int  # suggested spark.sql.execution.arrow.maxRecordsPerBatch


def estimate_fixed_bytes(cfg: HyperSketchConfig) -> int:
    d, w = cms_dims(cfg.delta, cfg.epsilon)
    table = d * w * 8
    scratch = w * 8  # one bincount row at a time
    return table + scratch


def estimate_bytes_per_doc(cfg: HyperSketchConfig, typical_len: int, conv: bool = False) -> int:
    """Peak kernel bytes attributable to one document of `typical_len`
    tokens (cf. estimate_memory_per_batch, src/memory.jl:9-31)."""
    L = max(typical_len, cfg.motif_size)
    kw = cfg.conv_key_width() if conv else cfg.motif_size
    cells = comb(L, cfg.motif_size) * kw
    return cells * BYTES_PER_CELL


def observed_typical_len(df, cfg: HyperSketchConfig) -> int:
    """90th-percentile sequence length — one cheap aggregate over the input
    (the stand-in for the reference's free-GPU-memory probe).  Uses the
    n_tok column when present, else sizes the token arrays."""
    from pyspark.sql import functions as F

    col = F.col("n_tok") if "n_tok" in df.columns else F.size(F.col(cfg.tokens_col))
    row = df.select(F.percentile_approx(col, 0.9).alias("p90")).first()
    return int(row.p90 or cfg.motif_size)


def resolve_plan(df, cfg: HyperSketchConfig, conv: bool):
    """The single budget-resolution point: (resolved_cfg, plan | None).
    Resolves cfg.max_cells from the memory planner when the caller set a
    memory budget (clearing the budget so it runs exactly once per job) and
    returns the plan for callers that also need arrow_batch_rows."""
    if cfg.memory_budget_bytes is None:
        return cfg, None
    import dataclasses

    plan = plan_memory(
        cfg,
        typical_len=observed_typical_len(df, cfg),
        budget_bytes=cfg.memory_budget_bytes,
        conv=conv,
    )
    resolved = dataclasses.replace(
        cfg, max_cells=plan.max_cells, memory_budget_bytes=None
    )
    return resolved, plan


def planned_config(df, cfg: HyperSketchConfig, conv: bool) -> HyperSketchConfig:
    """Pipeline wiring of plan_memory — results are unchanged by
    construction (max_cells only chunks work), verified by
    tests/test_memory_plan.py."""
    return resolve_plan(df, cfg, conv)[0]


def plan_memory(
    cfg: HyperSketchConfig,
    *,
    typical_len: int,
    budget_bytes: int = 512 * 1024 * 1024,
    conv: bool = False,
) -> MemoryPlan:
    """Size chunk cap + Arrow batch rows for a per-task memory budget
    (the reference's 80%-of-free-GPU heuristic, src/memory.jl:117-121,
    re-targeted at executor-python memory)."""
    fixed = estimate_fixed_bytes(cfg)
    per_doc = estimate_bytes_per_doc(cfg, typical_len, conv)
    usable = max(budget_bytes - fixed, budget_bytes // 5)
    max_cells = max(1000, int(usable // BYTES_PER_CELL))
    rows = usable // max(per_doc, 1)
    arrow_rows = int(min(MAX_BATCH_ROWS, max(MIN_BATCH_ROWS, rows)))
    return MemoryPlan(
        fixed_bytes=fixed,
        bytes_per_doc=per_doc,
        max_cells=min(max_cells, 32_000_000),
        arrow_batch_rows=arrow_rows,
    )
