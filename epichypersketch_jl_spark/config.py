"""Job configuration (reference: src/config.jl:6-38 HyperSketchConfig).

The reference carries (delta, epsilon, min_count, batch_size, use_cuda, CUDA
thread tuples, seed).  GPU knobs have no Spark counterpart; `batch_size` maps
to Arrow's `spark.sql.execution.arrow.maxRecordsPerBatch` plus our internal
row-chunking cap inside the kernels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .errors import ConfigError

# Reference defaults: src/EpicHyperSketch.jl:14-16.
DEFAULT_DELTA = 1e-4
DEFAULT_EPSILON = 5e-5
# Internal cap on (rows_in_chunk * C(L,k)) cells materialized at once inside
# a kernel — the Spark analog of the reference's memory planner
# (src/memory.jl:97-148): bound peak memory per task, not per GPU.
# 512k keeps the per-chunk stream working set near cache-resident, which
# measured ~40-75% faster than 4M under full-box concurrency (DRAM-bound).
DEFAULT_MAX_CELLS = 512_000


def cms_dims(delta: float, epsilon: float) -> tuple[int, int]:
    """(depth d, width w) from the standard CMS formulas.

    Reference src/sketch.jl:39-78: d = ceil(ln(1/delta)), w = ceil(e/epsilon)
    (computed there as num_counters ÷ d with num_counters = d*ceil(e/eps)).
    """
    d = max(1, math.ceil(math.log(1.0 / delta)))
    w = max(2, math.ceil(math.e / epsilon))
    return d, w


@dataclass(frozen=True)
class HyperSketchConfig:
    """Configuration for a motif-sketch job.

    Attributes
    ----------
    motif_size : k, the combination size (reference ``motif_size``).
    min_count  : selection threshold on the CMS estimate.
    delta, epsilon : CMS error parameters; est <= true + eps*N w.p. >= 1-delta.
    filter_len : convolution mode only — gap = pos_{j+1} - pos_j - filter_len.
                 We adopt the reference's CPU semantics (src/count_cpu.jl:47-53:
                 reject gap < 0) over the GPU's (src/count_gpu.jl:51-53), which
                 ignores filter_len — see SURVEY.md §2 #10.
    gap_mode   : "cpu" (default, the semantics above) or "gpu" — emulate the
                 GPU counting kernel's divergent gap = delta_pos with no
                 overlap rejection, for divergence-complete reference parity.
    seed       : seeds the CMS hash coefficients; identical on every executor
                 so partition sketches merge by elementwise addition.
    conservative : use conservative update (still never undercounts; tighter).
    max_cells  : peak cells per kernel chunk (memory planner stand-in).
    memory_budget_bytes : when set, the motif pipeline derives max_cells
                 from the memory planner (plans/memory.py:plan_memory) using
                 the observed typical sequence length, instead of the static
                 DEFAULT_MAX_CELLS — the Spark analog of the reference's
                 auto_configure_batch_size (src/memory.jl:172-228).
    """

    motif_size: int = 2
    min_count: int = 1
    delta: float = DEFAULT_DELTA
    epsilon: float = DEFAULT_EPSILON
    filter_len: int = 0
    gap_mode: str = "cpu"
    seed: int = 42
    conservative: bool = False
    max_cells: int = DEFAULT_MAX_CELLS
    memory_budget_bytes: int | None = None
    # Columns of the input table (input_hint schema by default).
    doc_id_col: str = "doc_id"
    tokens_col: str = "tokens"
    positions_col: str = "positions"
    weights_col: str = "weights"

    def __post_init__(self) -> None:  # validation: reference src/config.jl:40-45
        if self.motif_size < 1:
            raise ConfigError(f"motif_size must be >= 1, got {self.motif_size}")
        if self.min_count < 1:
            raise ConfigError(f"min_count must be >= 1, got {self.min_count}")
        if not (0.0 < self.delta < 1.0):
            raise ConfigError(f"delta must be in (0,1), got {self.delta}")
        if not (0.0 < self.epsilon < 1.0):
            raise ConfigError(f"epsilon must be in (0,1), got {self.epsilon}")
        if self.filter_len < 0:
            raise ConfigError(f"filter_len must be >= 0, got {self.filter_len}")
        if self.gap_mode not in ("cpu", "gpu"):
            raise ConfigError(f"gap_mode must be 'cpu' or 'gpu', got {self.gap_mode!r}")
        if self.max_cells < 1000:
            raise ConfigError(f"max_cells too small: {self.max_cells}")
        if self.memory_budget_bytes is not None and self.memory_budget_bytes < (1 << 20):
            raise ConfigError(
                f"memory_budget_bytes must be >= 1 MiB, got {self.memory_budget_bytes}"
            )

    @property
    def depth(self) -> int:
        return cms_dims(self.delta, self.epsilon)[0]

    @property
    def width(self) -> int:
        return cms_dims(self.delta, self.epsilon)[1]

    @property
    def key_width(self) -> int:
        """Number of int components in a pattern key: k for ordinary,
        2k-1 for convolution (k filter IDs interleaved with k-1 gaps);
        reference src/sketch.jl:84-88."""
        return self.motif_size

    def conv_key_width(self) -> int:
        return 2 * self.motif_size - 1
