"""Micro-bench for the grouped-sketch group handling (VERDICT r2 item 5).

Round 2's grouped-HLL kernel did `to_pylist()` + a Python loop slicing
flat values per group per batch — fine at 20 groups, wasteful at high
group cardinality.  The round-3 kernel dictionary-encodes the group
column, repeats codes to value level, and gathers each group's values as
a contiguous slice after ONE stable argsort (operators/cardinality.py
_grouped_blobs).  This bench pins the claim: build wall time over a fixed
5M-value input should be ~flat as the number of groups goes 10 -> 100k.

Input is synthesized JVM-side from spark.range (deterministic xxhash64
tokens/groups, no external data).

Usage: PYTHONPATH=/root/repo python BENCH/grouped_micro.py
Writes: BENCH/grouped_micro.json (and prints a markdown table)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_ROWS = 5_000_000


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

    from epichypersketch_jl_spark.operators.cardinality import hll_distinct

    results = []
    for n_groups in (10, 1_000, 100_000):
        df = (
            spark.range(N_ROWS)
            .withColumn("value", F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
            .withColumn(
                "grp",
                F.concat(
                    F.lit("g"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_groups))
                ),
            )
            .select("value", "grp")
        ).cache()
        df.count()  # materialize outside the timed region
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            out = hll_distinct(df, "value", group_col="grp")
            n = out.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        df.unpersist()
        results.append(
            {"n_groups": n_groups, "wall_sec": round(best, 3), "out_rows": n}
        )
        print(results[-1], flush=True)
    spark.stop()

    with open(os.path.join(REPO, "BENCH", "grouped_micro.json"), "w") as f:
        json.dump({"n_rows": N_ROWS, "runs": results}, f, indent=1)

    print("| groups | grouped-HLL build (s, best of 3) | output rows |")
    print("|---|---|---|")
    for r in results:
        print(f"| {r['n_groups']:,} | {r['wall_sec']} | {r['out_rows']:,} |")


if __name__ == "__main__":
    main()
