"""Approximate top-k / heavy hitters via mergeable Misra-Gries summaries.

The frequency-selection companion to the CMS point-query path (reference
EpicHyperSketch.jl selects heavy patterns by thresholding CMS estimates,
src/count_gpu_extract.jl): where the CMS answers "how often does THIS key
occur", a top-k summary answers "WHICH keys occur most often" without a
full count table.

Design (Spark-first, not a port):

- map side (one ``mapInArrow`` pass): each task computes counts of the
  values it saw — per group when a group column is given — fully
  vectorized (argsort/lexsort + ``add.reduceat``; string values are
  Arrow-dictionary-encoded so only distinct strings touch Python), and
  truncates each (task, group) count table to a Misra-Gries summary of at
  most ``n_counters`` entries by subtracting the (n_counters+1)-th largest
  count ``d`` and dropping non-positive rows.  Each truncation removes at
  least ``(n_counters+1) * d`` occurrence mass, so the summed decrements
  per group obey  sum(d) <= N_group / (n_counters + 1)  — the classic
  Misra-Gries bound, which both the *intermediate* truncations and the
  merge below PRESERVE (mergeable-summaries construction: Agarwal,
  Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012,
  section 3).  Truncation runs not just at stream end but whenever the
  task accumulator exceeds ``map_rows_budget`` distinct rows, so per-task
  memory is O(max(budget, groups_seen * n_counters)) — NOT O(distinct
  values) — and a high-cardinality value column (URLs, user ids) at
  100 TB cannot blow a worker: the summary stays a summary map-side too.
- merge side is pure Catalyst and a SINGLE pass over the summaries:
  ``groupBy(group, item).sum(est)`` merges them (sum of underestimates is
  an underestimate; absent rows contribute their slice's ``d`` to the
  error budget); the decrement rows (item = NULL) fold into the per-group
  ``err_bound`` via a window sum over the already-aggregated rows, so the
  input scan and the Python kernel execute exactly once.  A window
  ``row_number`` then takes the top-k.  Shuffle volume is bounded by
  ``n_tasks * (n_counters + 1)`` rows per group — never O(distinct
  values) — so the plan survives a 100-TB scan unchanged.

NULL discipline: NULL values of ``value_col`` (and NULL elements inside
array values) are dropped before counting, on every type path — matching
``kmv_sketch_per_group``.  NULL group keys form their own group.

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
    map_rows_budget: int = 1 << 20,
) -> DataFrame:
    """Approximate top-k most frequent values of ``value_col`` (scalar
    long/int, scalar string, or array<int>), overall or per group.

    Returns (group_col?, item, est_count, err_bound) with at most ``k``
    rows per group ordered by estimate (``k=None`` returns the full
    summary — every value whose merged estimate is positive).  Estimates
    never overcount; ``err_bound`` caps the undercount per group and is
    at most N_group / (n_counters + 1).

    ``map_rows_budget`` caps the number of distinct (group, value) rows a
    task accumulates before an intermediate Misra-Gries truncation — the
    memory/accuracy dial for extreme-cardinality value columns.  NULL
    values (and NULL array elements) are never counted.
    """
    if n_counters < 1:
        raise InputError(f"n_counters must be >= 1, got {n_counters}")
    if k is not None and k < 1:
        raise InputError(f"k must be >= 1 or None, got {k}")
    if map_rows_budget < 1:
        raise InputError(f"map_rows_budget must be >= 1, got {map_rows_budget}")

    vtype = df.schema[value_col].dataType.typeName()
    is_list = vtype == "array"
    is_str = vtype == "string"
    grouped = group_col is not None
    # NULL discipline (matches kmv_sketch_per_group): NULL values never
    # count as items.  array_compact drops NULL elements JVM-side.
    vexpr = (
        F.array_compact(F.col(value_col)).alias(value_col)
        if is_list
        else F.col(value_col)
    )
    if grouped:
        src = df.select(vexpr, group_col)
    else:
        src = df.select(vexpr)
    if not is_list:
        src = src.where(F.col(value_col).isNotNull())

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
    budget = map_rows_budget

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
        acc_rows = 0
        # intermediate-truncation decrements: each flush of a group's
        # table removes >= (m+1)*d mass, so these d's share the same
        # N_group/(m+1) budget as the final one (PODS'12 mergeability)
        dg_chunks: list[np.ndarray] = []
        dd_chunks: list[np.ndarray] = []

        def _flush(final: bool):
            nonlocal t_chunks, v_chunks, c_chunks, acc_rows
            t, v, c = _sum_by_key(
                np.concatenate(t_chunks),
                np.concatenate(v_chunks),
                np.concatenate(c_chunks),
            )
            kt, kv, ke, dg, dd = _truncate_groups(t, v, c, m)
            if len(dg):
                dg_chunks.append(dg)
                dd_chunks.append(dd)
            if final:
                return kt, kv, ke
            if is_str and len(vnames) > len(kv):
                # compact the string dictionary to surviving codes so it
                # is bounded by the summary size, not distinct strings
                uniq = np.unique(kv) if len(kv) else np.empty(0, dtype=np.int64)
                remap = np.full(len(vnames), -1, dtype=np.int64)
                remap[uniq] = np.arange(len(uniq))
                kv = remap[kv]
                kept_names = [vnames[i] for i in uniq]
                vnames[:] = kept_names
                vid_of.clear()
                vid_of.update({nm: i for i, nm in enumerate(kept_names)})
            t_chunks, v_chunks, c_chunks = [kt], [kv], [ke]
            acc_rows = len(kt)
            return None

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
            acc_rows += len(t)
            if acc_rows > budget:
                _flush(final=False)
        if not t_chunks:
            return
        kt, kv, ke = _flush(final=True)
        if dg_chunks:
            # collapse repeated per-group decrements into one row each
            dg, _, dd = _sum_by_key(
                np.concatenate(dg_chunks),
                np.concatenate(dg_chunks),
                np.concatenate(dd_chunks),
            )
        else:
            dg = dd = np.empty(0, dtype=np.int64)

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
    # one aggregation merges both the item counters and the decrement
    # rows (item = NULL); the per-group err_bound then falls out of a
    # window sum over the already-tiny aggregated summary, so the input
    # scan + Python kernel run exactly once (no self-join, no re-scan)
    agg = summ.groupBy("group", "item").agg(F.sum("est").alias("est_count"))
    wg = Window.partitionBy("group")
    out = (
        agg.withColumn(
            "err_bound",
            F.coalesce(
                F.sum(
                    F.when(F.col("item").isNull(), F.col("est_count"))
                ).over(wg),
                F.lit(0).cast("long"),
            ),
        )
        .where(F.col("item").isNotNull())
    )
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
