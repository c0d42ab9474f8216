"""Distributed sketch build: partition-local numpy build inside mapInArrow,
then an associative tree merge of serialized blobs.

This is the Spark-native replacement for the reference's implicit merge
(all batches/partitions mutate ONE shared sketch object sequentially,
src/count_gpu_extract.jl:41-44, src/partition.jl:148).  Making the merge an
explicit `+` over seed-aligned sketches is what buys:

  * no shuffle of raw data — each task reads its split once, ships back a
    fixed-size blob (MBs) regardless of input size;
  * partition/order invariance (merge is associative + commutative);
  * the two-phase global-sketch-then-select design that removes the
    reference's cross-partition under-count caveat (src/partition.jl:271-287);
  * resumability: with a checkpoint dir, per-bucket blobs are persisted and
    completed buckets are skipped on re-run (north_rule requirement).

Scale notes (1000-executor / 100 TB): the build is map-only; the reduction is
`treeReduce` over ~#tasks blobs with depth 2 (fan-in ~sqrt(tasks)); the
checkpointed path shuffles only (bucket, row) once and writes blobs, so a
resume re-reads no completed input.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pyarrow as pa
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..sketches.base import MergeableSketch, from_bytes

# update_fn(sketch, record_batch, stats_dict) -> None; mutates sketch in place.
UpdateFn = Callable[[MergeableSketch, pa.RecordBatch, dict], None]

_BLOB_ARROW_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("sketch", pa.binary()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_updates", pa.int64()),
        ("wall_ms", pa.float64()),
    ]
)

BLOB_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("sketch", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("n_updates", LongType(), False),
        StructField("wall_ms", DoubleType(), False),
    ]
)


def merge_blob_bytes(a: bytes, b: bytes) -> bytes:
    sk = from_bytes(a)
    fast = getattr(sk, "merge_blob_inplace", None)
    if fast is not None:
        return fast(b).to_bytes()
    return sk.merge(from_bytes(b)).to_bytes()


def _make_build_fn(zero_fn: Callable[[], MergeableSketch], update_fn: UpdateFn, part_id_fn=None):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        sk = zero_fn()
        stats = {"n_rows": 0, "n_tokens": 0, "n_updates": 0}
        for b in batches:
            update_fn(sk, b, stats)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        yield pa.RecordBatch.from_pydict(
            {
                "part_id": [pid],
                "sketch": [sk.to_bytes()],
                "n_rows": [stats["n_rows"]],
                "n_tokens": [stats["n_tokens"]],
                "n_updates": [stats["n_updates"]],
                "wall_ms": [(time.monotonic() - t0) * 1000.0],
            },
            schema=_BLOB_ARROW_SCHEMA,
        )

    return fn


def build_sketch_distributed(
    df: DataFrame,
    zero_fn: Callable[[], MergeableSketch],
    update_fn: UpdateFn,
    *,
    tree_depth: int = 2,
    collect_threshold: int = 256,
) -> tuple[MergeableSketch, list[dict]]:
    """Fast path: one map-only pass, no shuffle of raw rows.

    Returns (merged sketch, per-task metrics).  One (compressed) blob per
    input partition.  Merge strategy is adaptive:
      * small fan-in (local mode, <= collect_threshold partitions): one job,
        collect blobs, merge driver-side — no extra stages;
      * large fan-in (real clusters): treeReduce with depth 2, so the driver
        receives exactly one blob regardless of task count.
    """
    out = df.mapInArrow(_make_build_fn(zero_fn, update_fn), BLOB_SCHEMA)
    n_parts = df.rdd.getNumPartitions()
    if n_parts <= collect_threshold:
        rows = out.collect()  # single job
        if not rows:
            return zero_fn(), []
        sk = from_bytes(bytes(rows[0].sketch))
        # blob-level fast path (CMS): decode straight into the accumulator,
        # no per-blob widening copy; the bulk variant overlaps decompression
        # across blobs (threaded — zlib releases the GIL)
        bulk = getattr(sk, "merge_blobs_inplace", None)
        fast = getattr(sk, "merge_blob_inplace", None)
        if bulk is not None:
            bulk(bytes(r.sketch) for r in rows[1:])
        else:
            for r in rows[1:]:
                if fast is not None:
                    fast(bytes(r.sketch))
                elif hasattr(sk, "merge_inplace"):
                    sk = sk.merge_inplace(from_bytes(bytes(r.sketch)))
                else:
                    sk = sk.merge(from_bytes(bytes(r.sketch)))
        metrics = [{k: v for k, v in r.asDict().items() if k != "sketch"} for r in rows]
        return sk, metrics
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        blob_rdd = out.select("sketch").rdd.map(lambda r: bytes(r[0]))
        if blob_rdd.isEmpty():
            return zero_fn(), []
        merged_bytes = blob_rdd.treeReduce(merge_blob_bytes, depth=tree_depth)
        metrics = [r.asDict() for r in out.drop("sketch").collect()]
    finally:
        out.unpersist()
    return from_bytes(merged_bytes), metrics


def resolve_checkpoint_dir(spark, prefix: str) -> str:
    """Resolve a fresh checkpoint directory for build_sketch_checkpointed.

    Uses `spark.epichypersketch.checkpointDir` when set (REQUIRED on a real
    cluster: executors write bucket blobs with spark parquet writes, so the
    path must be on a filesystem every executor AND the driver can see —
    HDFS/S3/NFS).  Falls back to a driver-local tempdir, which is correct
    only in local mode where driver and "executors" share one machine.
    """
    import tempfile
    import uuid

    base = spark.conf.get("spark.epichypersketch.checkpointDir", None)
    if base:
        return f"{base.rstrip('/')}/{prefix}{uuid.uuid4().hex}"
    return tempfile.mkdtemp(prefix=prefix)


def delete_dir(spark, path: str) -> None:
    """Recursively delete `path` through the Hadoop FileSystem API, so it
    works for both local dirs and shared-filesystem checkpoint dirs."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def build_sketch_checkpointed(
    df: DataFrame,
    zero_fn: Callable[[], MergeableSketch],
    update_fn: UpdateFn,
    *,
    checkpoint_dir: str,
    n_buckets: int = 64,
    doc_id_col: str = "doc_id",
) -> tuple[MergeableSketch, list[dict]]:
    """Resumable path: rows are hashed into stable buckets, one sketch blob is
    built and persisted per bucket, and completed buckets are skipped on
    re-run.  Costs one shuffle (groupBy bucket) — the price of bucket-atomic
    checkpoints; use build_sketch_distributed when resumability isn't needed.
    """
    spark = df.sparkSession
    done: set[int] = set()
    try:
        existing = spark.read.parquet(checkpoint_dir)
        done = {r.part_id for r in existing.select("part_id").distinct().collect()}
    except Exception:
        existing = None

    bucketed = df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(doc_id_col)), F.lit(n_buckets)).cast("int")
    )
    todo = bucketed.filter(~F.col("__bucket").isin(*done)) if done else bucketed

    def fn(key: tuple, table: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        sk = zero_fn()
        stats = {"n_rows": 0, "n_tokens": 0, "n_updates": 0}
        for b in table.drop_columns(["__bucket"]).to_batches():
            update_fn(sk, b, stats)
        return pa.table(
            {
                "part_id": [int(key[0].as_py())],
                "sketch": [sk.to_bytes()],
                "n_rows": [stats["n_rows"]],
                "n_tokens": [stats["n_tokens"]],
                "n_updates": [stats["n_updates"]],
                "wall_ms": [(time.monotonic() - t0) * 1000.0],
            },
            schema=_BLOB_ARROW_SCHEMA,
        )

    if todo.limit(1).count() > 0:
        todo.groupBy("__bucket").applyInArrow(fn, BLOB_SCHEMA).write.mode("append").parquet(
            checkpoint_dir
        )

    all_blobs = spark.read.parquet(checkpoint_dir)
    # dedupe defensively: a re-run appends identical blobs for a bucket;
    # keeping one per bucket keeps the merge exact.
    rows = (
        all_blobs.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("part_id").orderBy("wall_ms")),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    )
    if not rows:
        return zero_fn(), []
    sk = from_bytes(bytes(rows[0].sketch))
    for r in rows[1:]:
        sk = sk.merge(from_bytes(bytes(r.sketch)))
    metrics = [{k: v for k, v in r.asDict().items() if k != "sketch"} for r in rows]
    return sk, metrics
