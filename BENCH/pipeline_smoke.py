"""Training-data-pipeline smoke at the 1M-row tier: MinHash-LSH dedup with
planted near-duplicates, exact dedup, and IVF ANN over 1M embeddings.

Evidence that the dedup/ANN operators' bucketed plans hold beyond the gate
SF: shuffle volume tracks near-duplicate density / probed clusters, never
N^2.  Deterministic JVM-side data generation (xxhash64), no external data.

Usage:  PYTHONPATH=/root/repo python BENCH/pipeline_smoke.py [--docs 1000000]
Writes: BENCH/pipeline_smoke.json (and prints one JSON line)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build(docs: int):
    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.default.parallelism", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "100g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- corpus: every did % 100 == 1 is a near-dup of did - 1 (one word
    # appended -> 3-shingle jaccard ~ 0.95 for 20-word docs)
    vocab = 30_000
    base = (
        spark.range(docs)
        .withColumnRenamed("id", "did")
        .withColumn("is_dup", F.pmod("did", F.lit(100)) == 1)
        .withColumn("seed", F.when(F.col("is_dup"), F.col("did") - 1).otherwise(F.col("did")))
        .withColumn("n_words", (F.pmod(F.xxhash64("seed"), F.lit(30)) + 15).cast("int"))
        .withColumn(
            "words",
            F.transform(
                F.sequence(F.lit(1), F.col("n_words")),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("seed") * 1000 + i), F.lit(vocab))
                ),
            ),
        )
        .withColumn(
            "text",
            F.when(
                F.col("is_dup"), F.concat_ws(" ", F.concat_ws(" ", "words"), F.lit("xdup"))
            ).otherwise(F.concat_ws(" ", "words")),
        )
        .withColumn("doc_id", F.format_string("doc_%09d", "did"))
        .select("doc_id", "text")
    )
    data = os.path.join(REPO, ".cache", f"pipeline_docs_{docs}.parquet")
    # gate on the commit marker, not bare existence: a killed run leaves a
    # truncated directory that would silently skew every number
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        base.repartition(128).write.mode("overwrite").parquet(data)
    df = spark.read.parquet(data)
    planted = len(range(1, docs, 100))  # dids 1, 101, 201, ... < docs

    out = {"docs": docs, "planted_neardups": planted}

    # ---- exact dedup (hash groupBy)
    from epichypersketch_jl_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    t0 = time.monotonic()
    n_groups = exact_dedup(df).filter("group_size > 1").count()
    out["exact_dedup_sec"] = round(time.monotonic() - t0, 1)
    out["exact_dup_rows"] = n_groups

    # ---- MinHash-LSH near-dup at 1M docs (bands solved from the threshold)
    from epichypersketch_jl_spark.operators.dedup import solve_lsh_params

    out["lsh_bands_rows"] = list(solve_lsh_params(0.5, 64))
    # two reps: the first pays session warmup (JIT, Python workers, page
    # cache) that a production job amortizes; both are recorded
    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(df, n=3, num_perm=64, threshold=0.5)
        n_pairs = pairs.count()
        walls.append(round(time.monotonic() - t0, 1))
    out["minhash_lsh_sec"] = min(walls)
    out["minhash_lsh_reps"] = walls
    out["lsh_pairs_found"] = n_pairs
    if planted:
        out["lsh_recall_vs_planted"] = round(n_pairs / planted, 4)

    # ---- IVF ANN over 1M synthetic embeddings (dim 64)
    emb = (
        spark.range(docs)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("vec_id") * 67 + i), F.lit(2000)) / 1000.0 - 1.0
                ).cast("float"),
            ),
        )
    ).persist()
    emb.count()
    queries = emb.filter("vec_id < 10")
    from epichypersketch_jl_spark.operators.similarity import cosine_topk_ivf

    t0 = time.monotonic()
    ivf = cosine_topk_ivf(emb, queries, k=10, nlist=64, nprobe=8)
    out["ivf_rows"] = ivf.count()
    out["ivf_ann_sec"] = round(time.monotonic() - t0, 1)
    emb.unpersist()

    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    args = ap.parse_args()
    out = build(args.docs)
    with open(os.path.join(REPO, "BENCH", "pipeline_smoke.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
