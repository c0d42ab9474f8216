"""Approximate top-k / heavy hitters via mergeable Misra-Gries summaries.

The frequency-selection companion to the CMS point-query path (reference
EpicHyperSketch.jl selects heavy patterns by thresholding CMS estimates,
src/count_gpu_extract.jl): where the CMS answers "how often does THIS key
occur", a top-k summary answers "WHICH keys occur most often" without a
full count table.

Design (Spark-first, not a port):

- map side (one ``mapInArrow`` pass): each task computes exact counts of
  the values it saw — per group when a group column is given — fully
  vectorized (argsort/lexsort + ``add.reduceat``; string values are
  Arrow-dictionary-encoded so only distinct strings touch Python), then
  truncates each (task, group) count table to a Misra-Gries summary of at
  most ``n_counters`` entries by subtracting the (n_counters+1)-th largest
  count ``d`` and dropping non-positive rows.  Each truncation removes at
  least ``(n_counters+1) * d`` occurrence mass, so the summed decrements
  per group obey  sum(d) <= N_group / (n_counters + 1)  — the classic
  Misra-Gries bound, which the merge below PRESERVES (mergeable-summaries
  construction: Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  Summaries", PODS 2012, section 3).
- merge side is pure Catalyst: summaries are plain rows, so
  ``groupBy(group, item).sum(est)`` merges them (sum of underestimates is
  an underestimate; absent rows contribute their slice's ``d`` to the
  error budget), decrement rows (item = NULL) aggregate to the per-group
  ``err_bound``, and a window ``row_number`` takes the top-k.  Shuffle
  volume is bounded by ``n_tasks * (n_counters + 1)`` rows per group —
  never O(distinct values) — so the plan survives a 100-TB scan unchanged.

Guarantees (any partitioning, any batch order):
  est_count <= exact_count <= est_count + err_bound       (per emitted row)
  every value with exact_count * (n_counters+1) > N_group is emitted
  (its estimate is strictly positive in at least one slice summary).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import InputError
from ..functions.motif_kernels import list_column_to_numpy

_GROUP_ALL = "__all__"


def _sum_by_key(tids: np.ndarray, vals: np.ndarray, cnts: np.ndarray):
    """Collapse (tid, val) duplicates by summing counts.  Returns sorted-by
    (tid, val) arrays."""
    order = np.lexsort((vals, tids))
    t, v, c = tids[order], vals[order], cnts[order]
    new = np.concatenate(([True], (t[1:] != t[:-1]) | (v[1:] != v[:-1])))
    starts = np.flatnonzero(new)
    return t[starts], v[starts], np.add.reduceat(c, starts)


def _truncate_groups(tids: np.ndarray, vals: np.ndarray, cnts: np.ndarray, m: int):
    """Vectorized Misra-Gries truncation of every group's count table at
    once (no per-group Python loop): sort counts descending within group,
    subtract each group's (m+1)-th largest count, keep positive rows.

    Returns (tids, vals, ests) of the kept rows plus (gids, ds) — the
    per-group decrements for groups that actually truncated."""
    order = np.lexsort((-cnts, tids))
    t, v, c = tids[order], vals[order], cnts[order]
    starts = np.flatnonzero(np.concatenate(([True], t[1:] != t[:-1])))
    sizes = np.diff(np.concatenate((starts, [len(t)])))
    d_group = np.zeros(len(starts), dtype=np.int64)
    big = sizes > m
    d_group[big] = c[starts[big] + m]
    est = c - np.repeat(d_group, sizes)
    keep = est > 0
    return t[keep], v[keep], est[keep], t[starts[big]], d_group[big]


def approx_topk(
    df: DataFrame,
    value_col: str,
    *,
    k: int | None = 10,
    n_counters: int = 64,
    group_col: str | None = None,
) -> DataFrame:
    """Approximate top-k most frequent values of ``value_col`` (scalar
    long/int, scalar string, or array<int>), overall or per group.

    Returns (group_col?, item, est_count, err_bound) with at most ``k``
    rows per group ordered by estimate (``k=None`` returns the full
    summary — every value whose merged estimate is positive).  Estimates
    never overcount; ``err_bound`` caps the undercount per group and is
    at most N_group / (n_counters + 1).
    """
    if n_counters < 1:
        raise InputError(f"n_counters must be >= 1, got {n_counters}")
    if k is not None and k < 1:
        raise InputError(f"k must be >= 1 or None, got {k}")

    vtype = df.schema[value_col].dataType.typeName()
    is_list = vtype == "array"
    is_str = vtype == "string"
    grouped = group_col is not None
    if grouped:
        src = df.select(value_col, group_col)
    else:
        src = df.select(value_col)

    item_sql = "string" if is_str else "long"
    summ_schema = f"group string, item {item_sql}, est long"
    summ_arrow = pa.schema(
        [
            ("group", pa.string()),
            ("item", pa.string() if is_str else pa.int64()),
            ("est", pa.int64()),
        ]
    )
    m = n_counters

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # task-global dictionaries: only DISTINCT group names / string
        # values per batch cross into Python; counts flow through numpy
        tid_of: dict[str, int] = {}
        names: list[str] = []
        vid_of: dict[str, int] = {}
        vnames: list[str] = []

        def _codes(col: pa.Array, of: dict, out_names: list[str]) -> np.ndarray:
            denc = pc.fill_null(col.cast(pa.string()), "None").dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            remap = np.empty(len(denc.dictionary), dtype=np.int64)
            for bi, name in enumerate(denc.dictionary.to_pylist()):
                name = str(name)
                tid = of.get(name)
                if tid is None:
                    tid = of[name] = len(out_names)
                    out_names.append(name)
                remap[bi] = tid
            return remap[codes]

        t_chunks: list[np.ndarray] = []
        v_chunks: list[np.ndarray] = []
        c_chunks: list[np.ndarray] = []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if is_list:
                flat, offsets = list_column_to_numpy(batch.column(value_col))
                flat = flat.astype(np.int64, copy=False)
            elif is_str:
                flat = _codes(batch.column(value_col), vid_of, vnames)
                offsets = None
            else:
                flat = (
                    batch.column(value_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
                offsets = None
            if flat.size == 0:
                continue
            if grouped:
                tids = _codes(batch.column(group_col), tid_of, names)
                if is_list:
                    tids = np.repeat(tids, np.diff(offsets))
            else:
                tids = np.zeros(flat.size, dtype=np.int64)
            # pre-reduce the batch so the task accumulator holds distinct
            # (group, value) rows, not raw occurrences
            t, v, c = _sum_by_key(tids, flat, np.ones(flat.size, dtype=np.int64))
            t_chunks.append(t)
            v_chunks.append(v)
            c_chunks.append(c)
        if not t_chunks:
            return
        t, v, c = _sum_by_key(
            np.concatenate(t_chunks),
            np.concatenate(v_chunks),
            np.concatenate(c_chunks),
        )
        kt, kv, ke, dg, dd = _truncate_groups(t, v, c, m)

        def _gname(i: int) -> str:
            return names[i] if grouped else _GROUP_ALL

        def _item(x: int):
            return vnames[x] if is_str else int(x)

        out_g = [_gname(i) for i in kt] + [_gname(i) for i in dg]
        out_i = [_item(x) for x in kv] + [None] * len(dg)
        out_e = np.concatenate((ke, dd)).tolist()
        for lo in range(0, len(out_g), 8192):
            hi = lo + 8192
            yield pa.RecordBatch.from_pydict(
                {"group": out_g[lo:hi], "item": out_i[lo:hi], "est": out_e[lo:hi]},
                schema=summ_arrow,
            )

    summ = src.mapInArrow(fn, summ_schema)
    err = (
        summ.where(F.col("item").isNull())
        .groupBy("group")
        .agg(F.sum("est").alias("err_bound"))
    )
    cnt = (
        summ.where(F.col("item").isNotNull())
        .groupBy("group", "item")
        .agg(F.sum("est").alias("est_count"))
    )
    out = cnt.join(err, "group", "left").na.fill({"err_bound": 0})
    if k is not None:
        w = Window.partitionBy("group").orderBy(
            F.col("est_count").desc(), F.col("item").asc()
        )
        out = out.withColumn("__rk", F.row_number().over(w)).where(
            F.col("__rk") <= k
        ).drop("__rk")
    if grouped:
        return out.withColumnRenamed("group", group_col).orderBy(
            group_col, F.col("est_count").desc(), "item"
        )
    return out.drop("group").orderBy(F.col("est_count").desc(), "item")
