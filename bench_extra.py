"""Round-6 optimization evidence harness (separate from the FROZEN bench.py).

Two measurements the headline bench cannot express:

1. noop-sink isolation (optimization guide §1.4): each headline query timed
   with `df.write.format("noop")` so the computation is measured, not the
   count() short-circuit, with jobs labelled for the UI.

2. skewed-bucket pair joins: a corpus whose SimHash band bucket is flooded
   by m identical docs.  Block cells (hot_bucket_docs) spread the bucket's
   m^2/2 pair expansion over tasks; without them one task owns it all.  The
   candidate SET is identical either way (pytest-pinned) — this measures
   the serialization, i.e. the 100-TB stage-staller the round-5 verdict
   flagged.

Usage:  PYTHONPATH=/root/repo python bench_extra.py [--skip-skew] [--m 6000]
Writes: BENCH/bench_extra.json (and prints one JSON line)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--m", type=int, default=6000, help="flooded-bucket size")
    ap.add_argument("--skip-skew", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from epichypersketch_jl_spark.session import apply_malloc_tuning

    apply_malloc_tuning()
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from epichypersketch_jl_spark import entrypoints as ep

    out: dict = {"sf_dir": args.sf_dir, "cpus": args.cpus}

    # ---- 1. noop-sink isolation of the headline queries -------------------
    queries = {
        "ntok_stats": ep.q_ntok_stats,
        "heavy_tokens": ep.q_heavy_tokens,
        "motifs_k2_summary": ep.q_motifs_k2_summary,
        "conv_motifs_k2": ep.q_conv_motifs_k2,
        "motifs_k3_summary": ep.q_motifs_k3_summary,
    }
    noop: dict[str, float] = {}
    for name, fn in queries.items():
        best = float("inf")
        for _ in range(args.reps):
            sc.setJobDescription(f"noop: {name}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        sc.setJobDescription(None)
        noop[name] = round(best, 3)
    out["noop_best_sec"] = noop

    # ---- 2. flooded bucket: block-cell expansion vs single-task ------------
    # The end-to-end pair count is m^2/2 either way (output-bound, and the
    # multi-bucket distinct costs the same at any split), so the stage the
    # block cells fix is the EXPANSION: one task exploding every pair of the
    # flooded bucket vs ~s(s+1)/2 cells doing it concurrently.  Measured via
    # the candidate plan without the trailing distinct (_dedupe hook).
    if not args.skip_skew:
        from epichypersketch_jl_spark.operators.dedup import _bucket_pair_join

        m = args.m
        banded = (
            spark.range(m)
            .withColumnRenamed("id", "doc_id")
            .withColumn("bh", F.lit(1))  # one flooded bucket
            .repartition(args.cpus)
        )
        skew: dict[str, float] = {}
        for label, cap in (("blocked", 512), ("single_task", None)):
            sc.setJobDescription(f"skew expansion: {label}")
            t0 = time.monotonic()
            (
                _bucket_pair_join(banded, "doc_id", cap, _dedupe=False)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            skew[label] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
        out["skew_expansion"] = skew
        out["skew_flooded_docs"] = m

    spark.stop()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bench_extra.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
