"""Bigger-SF bench point for the MOTIF headline set (VERDICT r2 item 8).

No sf1 directory ships in /root/testdata, so this script synthesizes a
deterministic sf1-equivalent documents table from sf0.1: each document is
replicated 10x; replica 0 keeps the original text, replicas 1-9 reorder
the words by an xxhash64 sort key derived from (word, position, replica,
doc_id).  Everything is JVM-side (split / transform / array_sort /
array_join) — no Python in the generator, no RNG (deterministic across
runs, per the no-Date.now/no-external-data rules).  Word shuffling keeps
the token multiset per document (ordinary motifs are order-insensitive,
so true pair counts scale exactly 10x) while changing conv gap structure
per replica, which is what the convolution kernel actually keys on.

It then runs the same headline queries bench.py runs, at BOTH tiers, and
prints per-query wall plus the sf1/sf0.1 cost ratio — the k=3 enumeration
cost curve and the tokenize-cache amortization the round-2 verdict asked
to see at a scale where JVM overheads stop dominating.

Usage: PYTHONPATH=/root/repo python BENCH/motif_scale.py
Writes: BENCH/motif_scale.json (and prints a markdown table for
BASELINE_static.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".cache", "sf1")
REPLICAS = 10

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def generate_sf1(spark: SparkSession) -> None:
    base = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    words = F.split(F.col("text"), " ")
    # (hash, word) structs -> array_sort orders by hash -> deterministic
    # per-(doc, replica) permutation of the original words
    keyed = F.transform(
        F.sequence(F.lit(0), F.size(words) - 1),
        lambda i: F.struct(
            F.xxhash64(
                F.element_at(words, i + 1), F.col("rep"), F.col("doc_id"), i
            ).alias("h"),
            F.element_at(words, i + 1).alias("w"),
        ),
    )
    shuffled = F.array_join(
        F.transform(F.array_sort(keyed), lambda s: s["w"]), " "
    )
    out = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("text", F.when(F.col("rep") == 0, F.col("text")).otherwise(shuffled))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
        .withColumn("n_chars", F.length("text"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "documents.parquet")
    )


def bench_tier(spark: SparkSession, sf_dir: str, reps: int) -> dict:
    from epichypersketch_jl_spark import entrypoints as ep
    from epichypersketch_jl_spark.sources.tables import tokenized_sequences

    times: dict[str, float] = {}
    t0 = time.monotonic()
    n_docs = tokenized_sequences(spark, sf_dir).count()
    times["tokenize_ingest"] = round(time.monotonic() - t0, 3)

    for name, fn in (
        ("ntok_stats", ep.q_ntok_stats),
        ("heavy_tokens", ep.q_heavy_tokens),
        ("motifs_k2_summary", ep.q_motifs_k2_summary),
        ("conv_motifs_k2", ep.q_conv_motifs_k2),
        ("motifs_k3_summary", ep.q_motifs_k3_summary),
    ):
        best, n = None, 0
        for _ in range(reps):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        times[f"rows_{name}"] = n
    times["n_docs"] = n_docs
    return times


def main() -> None:
    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        print("generating sf1 tier ...", flush=True)
        t0 = time.monotonic()
        generate_sf1(spark)
        print(f"generated in {time.monotonic() - t0:.1f}s", flush=True)

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    res = {
        "sf0.1": bench_tier(spark, SF01, reps),
        "sf1": bench_tier(spark, SF1, reps),
        "replicas": REPLICAS,
        "bench_reps": reps,
    }
    spark.stop()

    with open(os.path.join(REPO, "BENCH", "motif_scale.json"), "w") as f:
        json.dump(res, f, indent=1)

    # tokenize_ingest is excluded from the comparison table: it measures
    # the write-once cache (cold build vs warm hit depending on prior
    # runs), so sf0.1-vs-sf1 wall times are not physically comparable —
    # the raw numbers stay in the JSON for completeness.
    qnames = [
        "ntok_stats",
        "heavy_tokens",
        "motifs_k2_summary",
        "conv_motifs_k2",
        "motifs_k3_summary",
    ]
    lines = [
        "| query | sf0.1 (s) | sf1 (s) | cost ratio (ideal 10x) |",
        "|---|---|---|---|",
    ]
    for q in qnames:
        a, b = res["sf0.1"][q], res["sf1"][q]
        ratio = b / a if a else float("nan")
        lines.append(f"| {q} | {a} | {b} | {ratio:.1f}x |")
    print("\n".join(lines))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
