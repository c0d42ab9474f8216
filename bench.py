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

    from epichypersketch_jl_spark.session import apply_malloc_tuning

    apply_malloc_tuning()  # numpy-temp mmap churn: see session.MALLOC_TUNING
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


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _cpu_stat() -> tuple[int, int]:
    """(total, idle) jiffies across all CPUs from /proc/stat."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[3] + vals[4]  # idle + iowait


def _tree_jiffies() -> tuple[int, int]:
    """(ours, kernel_threads) CPU jiffies.  `ours` = utime+stime of this
    process and every live descendant — the Python driver plus the
    local-mode JVM and its Python workers.  `kernel_threads` = the kthreadd
    (pid 2) subtree: kworkers/kcompactd/khugepaged burn CPU SERVICING our
    own allocations, so counting them as foreign load misclassifies the
    bench's own memory churn as contamination (observed: fast reps
    rejected at ~6% "external" CPU that was kcompactd, while slow reps
    measured clean).  Dead children are not re-counted because reps
    compare deltas over an interval during which the tree is live."""
    info: dict[int, tuple[int, int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                s = f.read()
        except OSError:
            continue
        rest = s[s.rfind(")") + 2 :].split()
        info[int(pid)] = (int(rest[1]), int(rest[11]) + int(rest[12]))

    def subtree(root: int) -> int:
        total, frontier = 0, {root}
        while frontier:
            nxt = set()
            for pid, (ppid, _j) in info.items():
                if ppid in frontier:
                    nxt.add(pid)
            for pid in frontier:
                if pid in info:
                    total += info[pid][1]
            frontier = nxt
        return total

    return subtree(os.getpid()), subtree(2)


# A rep is contaminated when more than this fraction of the box's total CPU
# jiffies during the rep went to processes OUTSIDE our tree (kernel threads
# excluded — they service OUR allocations).  loadavg alone cannot make that
# call: our own 32-core burst inflates the 1-min average for the rest of
# the bench (BENCH_r04's phantom 2.2x regression, VERDICT r4).
EXT_CPU_CONTAMINATION_FRAC = 0.10


def run_reps(fn, reps: int, max_retries: int = 2):
    """Best-of-N with per-rep hygiene: each rep records wall time, loadavg at
    start, and the external-CPU fraction over the rep; contaminated reps are
    retried (bounded) and excluded from the accepted minimum when any clean
    rep exists.  Returns (best_wall, last_result, rep_records)."""
    recs: list[dict] = []
    result = None
    attempts = reps + max_retries
    while len([r for r in recs if r["accepted"]]) < reps and attempts > 0:
        attempts -= 1
        la = _loadavg()
        tot0, idle0 = _cpu_stat()
        ours0, kt0 = _tree_jiffies()
        t0 = time.monotonic()
        result = fn()
        wall = time.monotonic() - t0
        tot1, idle1 = _cpu_stat()
        ours1, kt1 = _tree_jiffies()
        total_j = max(1, tot1 - tot0)
        busy_j = total_j - (idle1 - idle0)
        ext_frac = max(0.0, busy_j - (ours1 - ours0) - (kt1 - kt0)) / total_j
        recs.append(
            {
                "wall_sec": round(wall, 3),
                "loadavg": la,
                "ext_cpu_frac": round(ext_frac, 4),
                "accepted": ext_frac <= EXT_CPU_CONTAMINATION_FRAC,
            }
        )
    accepted = [r["wall_sec"] for r in recs if r["accepted"]]
    if not accepted:  # every rep contaminated: flag, fall back to raw min
        accepted = [r["wall_sec"] for r in recs]
    return min(accepted), result, recs


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
    build_s, (cms, _metrics), recs = run_reps(
        lambda: build_motif_cms(
            seq, HyperSketchConfig(motif_size=2, min_count=1, seed=42)
        ),
        reps,
    )
    rep_log: dict[str, list] = {"sketch_build_k2": recs}
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
        best, n, recs = run_reps(lambda fn=fn: fn(spark, sf_dir).count(), reps)
        rep_log[name] = recs
        times[name] = round(best, 3)
        extras[f"rows_{name}"] = n
    extras["start_loadavg"] = start_load
    extras["bench_reps"] = reps
    extras["reps_detail"] = rep_log
    extras["bench_contaminated"] = any(
        not any(r["accepted"] for r in recs) for recs in rep_log.values()
    )
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
            best, n, recs = run_reps(lambda fn=fn: fn(spark, SF1).count(), reps)
            rep_log[f"sf1_{name}"] = recs
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
