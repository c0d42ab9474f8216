"""Distinct-count (HyperLogLog) and membership (Bloom) operators.

Part of the generalized sketch family (BASELINE.json north_star).  Same
plan shape as the CMS build: partition-local numpy sketches inside
mapInArrow, merged associatively — per group when a group column is given
(each task emits one blob per group it saw; blobs merge across tasks).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from ..functions.hashing import hash64
from ..functions.motif_kernels import list_column_to_numpy
from ..sketches.base import from_bytes
from ..sketches.bloom import BloomFilter
from ..sketches.hll import HyperLogLog

_BLOB_SCHEMA = StructType(
    [
        StructField("group", StringType(), False),
        StructField("sketch", BinaryType(), False),
    ]
)
_BLOB_ARROW = pa.schema([("group", pa.string()), ("sketch", pa.binary())])


def _grouped_blobs(
    df: DataFrame,
    value_col: str,
    group_col: str | None,
    zero_fn,
    update_fn,
    is_list: bool,
) -> dict[str, object]:
    """Run a mapInArrow pass emitting one sketch blob per (task, group),
    then merge per group on the driver (group cardinality is assumed small —
    it's a grouping key, not a payload)."""
    cols = [value_col] + ([group_col] if group_col else [])
    src = df.select(*cols)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        local: dict[str, object] = {}
        for batch in batches:
            if is_list:
                flat, offsets = list_column_to_numpy(batch.column(value_col))
            else:
                flat = batch.column(value_col).to_numpy(zero_copy_only=False)
                offsets = None
            if group_col is None:
                sk = local.setdefault("__all__", zero_fn())
                update_fn(sk, flat)
            else:
                # vectorized grouping: dictionary-encode the group column,
                # repeat codes to value level, one stable argsort, then each
                # group's values are a contiguous slice — no per-row Python,
                # O(V log V) regardless of group cardinality.
                import pyarrow.compute as pc

                gcol = pc.fill_null(batch.column(group_col).cast(pa.string()), "None")
                denc = gcol.dictionary_encode()
                codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                names = denc.dictionary.to_pylist()
                if is_list:
                    vcodes = np.repeat(codes, np.diff(offsets))
                else:
                    vcodes = codes
                vorder = np.argsort(vcodes, kind="stable")
                vals_sorted = flat[vorder]
                counts = np.bincount(vcodes, minlength=len(names))
                bounds = np.concatenate(([0], np.cumsum(counts)))
                for gi, name in enumerate(names):
                    if counts[gi] == 0:
                        continue
                    sk = local.setdefault(str(name), zero_fn())
                    update_fn(sk, vals_sorted[bounds[gi] : bounds[gi + 1]])
        for g, sk in local.items():
            yield pa.RecordBatch.from_pydict(
                {"group": [g], "sketch": [sk.to_bytes()]}, schema=_BLOB_ARROW
            )

    rows = src.mapInArrow(fn, _BLOB_SCHEMA).collect()
    merged: dict[str, object] = {}
    for r in rows:
        sk = from_bytes(bytes(r.sketch))
        merged[r.group] = merged[r.group].merge(sk) if r.group in merged else sk
    return merged


def hll_distinct(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str | None = None,
    p: int = 14,
    seed: int = 42,
) -> DataFrame:
    """Approximate distinct count of value_col (scalar or array element),
    overall or per group.  Returns (group?, approx_distinct: long)."""
    is_list = df.schema[value_col].dataType.typeName() == "array"

    def update(sk: HyperLogLog, vals: np.ndarray) -> None:
        sk.update_batch(vals)

    merged = _grouped_blobs(
        df, value_col, group_col, lambda: HyperLogLog(p=p, seed=seed), update, is_list
    )
    spark = df.sparkSession
    rows = [
        (g, int(round(sk.estimate())))
        for g, sk in sorted(merged.items())
    ]
    if group_col is None:
        return spark.createDataFrame(
            [(r[1],) for r in rows], schema="approx_distinct: long"
        )
    return spark.createDataFrame(rows, schema=f"{group_col}: string, approx_distinct: long")


def build_bloom(
    df: DataFrame,
    value_col: str,
    *,
    n_expected: int,
    fpp: float = 0.01,
    seed: int = 42,
) -> BloomFilter:
    """Distributed Bloom build over a scalar column; merge = OR."""
    is_list = df.schema[value_col].dataType.typeName() == "array"

    def update(sk: BloomFilter, vals: np.ndarray) -> None:
        sk.update_batch(vals)

    merged = _grouped_blobs(
        df,
        value_col,
        None,
        lambda: BloomFilter(n_expected=n_expected, fpp=fpp, seed=seed),
        update,
        is_list,
    )
    return merged["__all__"]


def _sketch_filter(df: DataFrame, probe_col: str, sketch_bytes: bytes, mask_fn) -> DataFrame:
    """Shared pre-shuffle reducer shape: broadcast one fixed-size sketch
    blob, filter each Arrow batch by mask_fn(sketch, probe_values) — no
    join, no shuffle (plan pinned by tests/test_plan_shapes.py)."""
    spark = df.sparkSession
    blob = spark.sparkContext.broadcast(sketch_bytes)
    src_schema = df.schema

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sk = from_bytes(blob.value)
        for batch in batches:
            vals = batch.column(probe_col).to_numpy(zero_copy_only=False)
            mask = mask_fn(sk, vals)
            if mask.any():
                yield batch.filter(pa.array(mask))

    return df.mapInArrow(fn, src_schema)


def bloom_semijoin(
    df: DataFrame, probe_col: str, bloom: BloomFilter
) -> DataFrame:
    """Filter df to rows whose probe_col might be in the bloom (no false
    negatives; FP rate per filter params).  The classic pre-shuffle
    semi-join reducer: ships a fixed-size bitset instead of a join."""
    return _sketch_filter(df, probe_col, bloom.to_bytes(), lambda sk, v: sk.contains(v))


def build_cms_over_column(
    df: DataFrame,
    value_col: str,
    *,
    delta: float = 1e-4,
    epsilon: float = 5e-5,
    seed: int = 42,
    conservative: bool = False,
):
    """Distributed CMS over a scalar integer column (key_width=1): the
    frequency companion to build_bloom.  Same map-only build + associative
    merge as the motif pipeline."""
    from ..sketches.cms import CountMinSketch
    from .sketch_build import build_sketch_distributed

    is_list = df.schema[value_col].dataType.typeName() == "array"

    def update(sk, batch, stats):
        if is_list:
            vals, _ = list_column_to_numpy(batch.column(value_col))
        else:
            vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        sk.update_batch_grouped(vals.astype(np.int64))
        stats["n_rows"] += batch.num_rows
        stats["n_updates"] += len(vals)

    zero = lambda: CountMinSketch(  # noqa: E731
        delta=delta, epsilon=epsilon, key_width=1, seed=seed, conservative=conservative
    )
    sk, _ = build_sketch_distributed(df.select(value_col), zero, update)
    return sk


def cms_semijoin(
    df: DataFrame, probe_col: str, cms, *, min_count: int
) -> DataFrame:
    """Frequency-gated semi-join: keep rows whose probe_col's CMS estimate
    is >= min_count — the heavy-hitter filter a training pipeline uses to
    gate on corpus-wide frequency WITHOUT materializing a count table.

    Never drops a truly-frequent key (CMS never undercounts); rare keys may
    survive with probability <= delta (overcount).  Ships a fixed-size
    sketch to every task instead of shuffling a count table — the same
    pre-shuffle-reducer shape as bloom_semijoin.
    """
    return _sketch_filter(
        df,
        probe_col,
        cms.to_bytes(),
        lambda sk, v: sk.estimate_grouped(v.astype(np.int64)) >= min_count,
    )
