"""Deterministic weighted sampling without replacement.

Efraimidis & Spirakis 2006 (A-ES): give each row the key
e_i = -ln(u_i) / w_i with u_i uniform on (0, 1]; the k smallest keys are
a weighted sample without replacement (each subset's probability matches
sequential draws proportional to weight).  The training-data use case:
pick k documents per shard/source with probability proportional to a
quality or length weight, reproducibly.

u_i is NOT random state: it derives from the KMV permutation hash of the
row id (u = (h+1) / 2^31, h uniform on [0, 2^31) — sketches/kmv.py), so
the sample is a pure function of the data.  That buys three properties a
`rand()`-based sample cannot give:
  * re-runs, retries, and re-partitioning select the SAME rows;
  * the selection is exactly recomputable in ANSI SQL (the driver's
    oracle re-derives the full sample, not just its size);
  * adding rows never changes the relative order of existing keys, so
    samples are stable under corpus growth the way stable_split is.
Vary `salt` to draw an independent sample.

Plan: the key is pure Catalyst arithmetic.  Grouped selection is a
per-group bottom-k window (hash-partitioned by group — parallel and
shuffle-bounded).  UNGROUPED selection never funnels the input through
one task: a streaming per-partition bottom-k (`mapInArrow`, buffer <= k
rows + one Arrow batch) prunes each partition to its k best candidates
with NO shuffle, then `orderBy(key).limit(k)` selects the global k from
the tasks*k survivors — Spark plans that as `TakeOrderedAndProject`
(local top-k + merge of pruned partials), so the physical plan contains
no SinglePartition exchange at any width.  Ranks are assigned by a
final kernel over the <= k selected rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import InputError
from ..sketches.kmv import P, hash_sql


def _bottomk_partial(src: DataFrame, key_col: str, id_col: str, k: int) -> DataFrame:
    """Prune every partition to its k smallest-(key, id) rows without
    shuffling: candidate buffer holds at most k rows + one Arrow batch."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cand: pa.Table | None = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            if cand is not None:
                tbl = pa.concat_tables([cand, tbl])
            if tbl.num_rows > k:
                keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
                ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
                order = np.lexsort((ids, keys))[:k]
                tbl = tbl.take(pa.array(order))
            cand = tbl.combine_chunks()
        if cand is not None and cand.num_rows:
            yield from cand.to_batches()

    return src.mapInArrow(fn, src.schema)


def _rank_selected(selected: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Assign sample_rank 1..n by ascending (key, id) over the already
    globally-selected rows.  `selected` is the output of a global
    limit(k), which Spark produces as a single partition of <= k rows, so
    a per-partition kernel IS the global ranking — no window, no
    SinglePartition exchange node."""
    # build a fresh StructType — StructType.add mutates the DataFrame's
    # cached schema object in place
    out_schema = T.StructType(
        list(selected.schema.fields)
        + [T.StructField("sample_rank", T.IntegerType(), False)]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tbls = [pa.Table.from_batches([b]) for b in batches if b.num_rows]
        if not tbls:
            return
        tbl = pa.concat_tables(tbls)
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        tbl = tbl.take(pa.array(order))
        tbl = tbl.append_column(
            "sample_rank", pa.array(np.arange(1, tbl.num_rows + 1, dtype=np.int32))
        )
        yield from tbl.to_batches()

    return selected.mapInArrow(fn, out_schema)


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    salt: int = 0,
) -> DataFrame:
    """k-row weighted sample without replacement (per group when
    `group_col` is given): rows with weight w are selected proportionally
    to w.  Returns the input columns plus `sample_rank` (1..k by
    ascending key).  Rows with NULL or non-positive weight are excluded
    (they have zero selection probability).  `id_col` must be integral
    AND unique — it feeds the deterministic hash, so rows sharing an id
    get identical keys and the tie between them is partition-order
    dependent, voiding the determinism guarantee for exactly those
    rows."""
    for c in [id_col, weight_col] + ([group_col] if group_col else []):
        if c not in df.columns:
            raise InputError(f"weighted_sample: input lacks column {c!r}")
    if k < 1:
        raise InputError("weighted_sample needs k >= 1")
    if df.schema[id_col].dataType.typeName() not in (
        "integer",
        "long",
        "short",
        "byte",
    ):
        raise InputError("weighted_sample: id_col must be an integer column")
    h = F.expr(hash_sql(f"(CAST({id_col} AS BIGINT) + {int(salt)})"))
    u = (h + F.lit(1)) / F.lit(float(P + 1))  # uniform on (0, 1]
    key = -F.log(u) / F.col(weight_col).cast("double")
    src = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_es_key", key)
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(
            F.col("_es_key").asc(), F.col(id_col).asc()
        )
        return (
            src.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k)
            .drop("_es_key")
        )
    # ungrouped: per-partition bottom-k prune (no shuffle), then global
    # top-k via TakeOrderedAndProject over the tasks*k survivors — the
    # full input never passes through a single-partition exchange
    cand = _bottomk_partial(src, "_es_key", id_col, k)
    selected = cand.orderBy(F.col("_es_key").asc(), F.col(id_col).asc()).limit(k)
    return _rank_selected(selected, "_es_key", id_col).drop("_es_key")
