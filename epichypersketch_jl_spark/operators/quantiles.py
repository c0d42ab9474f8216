"""Distributed quantiles via KLL and t-digest — same build/merge plumbing
as the other sketches (BASELINE.json north_star family)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from ..functions.motif_kernels import list_column_to_numpy
from ..sketches.base import from_bytes
from ..sketches.kll import KLL
from ..sketches.tdigest import TDigest
from .sketch_build import build_sketch_distributed


def _numeric_update(value_col: str, is_list: bool):
    def update(sk, batch: pa.RecordBatch, stats: dict) -> None:
        if is_list:
            vals, _ = list_column_to_numpy(batch.column(value_col))
        else:
            vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        sk.update_batch(vals)
        stats["n_rows"] += batch.num_rows
        stats["n_updates"] += len(vals)

    return update


def kll_quantiles(
    df: DataFrame, value_col: str, quantiles: list[float], *, k: int = 200, seed: int = 42
) -> dict[float, float]:
    is_list = df.schema[value_col].dataType.typeName() == "array"
    src = df.select(value_col)
    sk, _ = build_sketch_distributed(
        src, lambda: KLL(k=k, seed=seed), _numeric_update(value_col, is_list)
    )
    vals = sk.quantile(np.array(quantiles))
    return {q: float(v) for q, v in zip(quantiles, vals)}


def tdigest_quantiles(
    df: DataFrame, value_col: str, quantiles: list[float], *, compression: float = 200.0
) -> dict[float, float]:
    is_list = df.schema[value_col].dataType.typeName() == "array"
    src = df.select(value_col)
    sk, _ = build_sketch_distributed(
        src, lambda: TDigest(compression=compression), _numeric_update(value_col, is_list)
    )
    vals = sk.quantile(np.array(quantiles))
    return {q: float(v) for q, v in zip(quantiles, vals)}
