"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...}, "sf": ...} plus throughput extras.

The BASELINE.json headline metric is sketch-build tokens/sec; that is
reported as `tokens_per_sec` (build-phase only) alongside per-query wall
times.  Scaling-efficiency evidence (local[8] vs local[32]) lives in
BENCH/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ehs-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .getOrCreate()
    )


def wait_for_quiet(threshold: float = 2.0, timeout_s: float = 120.0) -> float:
    """Block until the 1-min loadavg settles (bounded).  Kernel memory
    compaction (khugepaged/kcompactd) after a previous Spark run measurably
    distorts timings on this box; starting into that churn is not a
    measurement of the code."""
    deadline = time.monotonic() + timeout_s
    load = 0.0
    while time.monotonic() < deadline:
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
        if load < threshold:
            break
        time.sleep(5)
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    start_load = wait_for_quiet()

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from epichypersketch_jl_spark import entrypoints as ep
    from epichypersketch_jl_spark.config import HyperSketchConfig
    from epichypersketch_jl_spark.operators.motif import build_motif_cms
    from epichypersketch_jl_spark.sources.tables import tokenized_sequences

    times: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ingest (one-time ETL, not query work): tokenize + write-once cache
    t0 = time.monotonic()
    tokenized_sequences(spark, sf_dir).count()
    extras["tokenize_sec"] = round(time.monotonic() - t0, 3)

    # q0: sketch-build throughput (the BASELINE.json headline); the cache
    # scan already yields ~cpus partitions (32 files + bytesPerCore split)
    seq = tokenized_sequences(spark, sf_dir).cache()
    n_tokens = seq.selectExpr("sum(n_tok) as t").collect()[0].t
    build_s = None
    for _rep in range(reps):
        t0 = time.monotonic()
        cms, metrics = build_motif_cms(
            seq, HyperSketchConfig(motif_size=2, min_count=1, seed=42)
        )
        dt = time.monotonic() - t0
        build_s = dt if build_s is None else min(build_s, dt)
    times["sketch_build_k2"] = round(build_s, 3)
    extras["tokens_per_sec"] = round(n_tokens / build_s, 1)
    extras["updates_per_sec"] = round(cms.n_updates / build_s, 1)
    extras["n_tokens"] = int(n_tokens)
    extras["n_updates"] = int(cms.n_updates)

    # cheap Catalyst-only queries first: the wide-table kernel queries leave
    # allocator/page-cache churn behind that would contaminate them
    bench_queries = {
        "ntok_stats": ep.q_ntok_stats,
        "heavy_tokens": ep.q_heavy_tokens,
        "motifs_k2_summary": ep.q_motifs_k2_summary,
        "conv_motifs_k2": ep.q_conv_motifs_k2,
        "motifs_k3_summary": ep.q_motifs_k3_summary,
    }
    for name, fn in bench_queries.items():
        best, n = None, 0
        for _rep in range(reps):  # best-of-N: single-box runs are noisy
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        extras[f"rows_{name}"] = n
    extras["start_loadavg"] = start_load
    extras["bench_reps"] = reps
    seq.unpersist()

    # sf1 tier (VERDICT r3 item 9): the recorded headline now carries the
    # 10x point too, so round-over-round comparisons happen where fixed
    # costs stop dominating.  The tier is synthesized deterministically
    # from sf0.1 (BENCH/motif_scale.generate_sf1 — pure Catalyst, no RNG)
    # the first time and cached.  Disable with SPARK_GRAFT_SF1=0.
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == 0.1:
        from BENCH.motif_scale import SF1, generate_sf1

        if not os.path.exists(os.path.join(SF1, "documents.parquet")):
            generate_sf1(spark)
        sf1_times: dict[str, float] = {}
        t0 = time.monotonic()
        tokenized_sequences(spark, SF1).count()
        sf1_times["tokenize_sec"] = round(time.monotonic() - t0, 3)
        for name, fn in bench_queries.items():
            best = None
            for _rep in range(reps):
                t0 = time.monotonic()
                n = fn(spark, SF1).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            sf1_times[name] = round(best, 3)
            sf1_times[f"rows_{name}"] = n
        sf1_times["total_sec"] = round(
            sum(v for k, v in sf1_times.items()
                if not k.startswith("rows_") and k != "tokenize_sec"),
            3,
        )
        extras["sf1"] = sf1_times

    spark.stop()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": cpus,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
