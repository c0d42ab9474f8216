"""Similarity search over embedding columns (array<float>).

  * cosine_topk      — exact brute-force top-k for a broadcast query set,
                       entirely in JVM higher-order functions (zip_with +
                       aggregate): the correctness baseline.
  * cosine_topk_lsh  — random-hyperplane LSH bucketing as the scale path:
                       each vector lands in 2^n_planes buckets; only
                       bucket-colliding pairs are scored.  Approximate
                       (recall < 1), used when the query set is not small.

Scale notes: the exact variant broadcasts the (small) query set — shuffle-
free, one scan; cost is O(N * Q * dim) JVM-side.  The LSH variant shuffles
by bucket id, so cost tracks bucket occupancy, with the plane count as the
recall/cost dial.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _cosine_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (self excluded).

    Returns (qid, nid, cos_pct: bigint) with cos_pct = floor(1e6 * cosine)
    — integer-exact output for oracle hashing; ties broken by nid.
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    e = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .withColumn("cos", _cosine_expr(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            "nid",
            F.floor(F.lit(1_000_000) * F.col("cos")).cast("long").alias("cos_pct"),
        )
    )


def hyperplane_buckets(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, table, bucket) — multi-table random-hyperplane LSH.

    Each of `n_tables` hash tables uses `n_planes` hyperplanes; a pair with
    cosine c collides in one table w.p. (1 - acos(c)/pi)^n_planes, and the
    table count is the recall dial: recall = 1 - (1 - p)^n_tables.  All sign
    computations happen in one (n, dim) x (dim, T*P) matmul per Arrow batch.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim)).astype(np.float64)
    src = emb.select(id_col, vec_col)
    out_schema = StructType(
        [
            src.schema[id_col],
            StructField("table", IntegerType(), False),
            StructField("bucket", IntegerType(), False),
        ]
    )
    weights = (1 << np.arange(n_planes)).astype(np.int32)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offsets = col.offsets.to_numpy().astype(np.int64)
            flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
            n = batch.num_rows
            if n == 0:
                continue
            mat = flat[offsets[:-1, None] + np.arange(dim)[None, :]]
            signs = ((mat @ planes.T) > 0).astype(np.int32)  # (n, T*P)
            buckets = signs.reshape(n, n_tables, n_planes) @ weights  # (n, T)
            ids = pc.take(
                batch.column(id_col), pa.array(np.repeat(np.arange(n), n_tables))
            )
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: ids,
                    "table": pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
                    "bucket": pa.array(buckets.astype(np.int32).ravel()),
                }
            )

    return src.mapInArrow(fn, out_schema)


def cosine_neardup_lsh(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket-colliding pairs verified by
    exact cosine >= threshold.  (a < b; cos_pct integer-exact.)"""
    b = hyperplane_buckets(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
        seed=seed,
    )
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.table") == F.col("y.table"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b"))
        .distinct()
    )
    vecs = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    out = (
        cand.join(vecs.withColumnRenamed(id_col, "doc_a").withColumnRenamed("v", "va"), "doc_a")
        .join(vecs.withColumnRenamed(id_col, "doc_b").withColumnRenamed("v", "vb"), "doc_b")
        .withColumn("cos", _cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.lit(1_000_000) * F.col("cos")).cast("long").alias("cos_pct"),
        )
    )
    return out
