"""spark-submit entry point for the motif pipeline (the reference's
`obtain_enriched_configurations`, src/count_gpu_extract.jl:203-250).

Usage:
    python jobs/make_dist.py   # builds dist/ehs.zip once
    spark-submit --py-files dist/ehs.zip jobs/enriched_configs.py \
        --input /path/to/sequences.parquet --k 3 --min-count 8 \
        --output /path/out [--mode conv --filter-len 8] \
        [--checkpoint-dir /path/ckpt --n-buckets 64] [--summary] \
        [--metrics-dir /path/logs]

Input table schema: (doc_id, tokens: array<int>, n_tok, source
[, positions: array<int>, weights: array<float>]) — BASELINE.json input_hint.
"""

from __future__ import annotations

import argparse
import uuid

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or table of sequences")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--k", type=int, default=2, help="motif size")
    ap.add_argument("--min-count", type=int, default=1)
    ap.add_argument("--mode", choices=["ordinary", "conv"], default="ordinary")
    ap.add_argument("--filter-len", type=int, default=8)
    ap.add_argument("--delta", type=float, default=1e-4)
    ap.add_argument("--epsilon", type=float, default=5e-5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--conservative", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None, help="resumable per-bucket sketch blobs")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--summary", action="store_true", help="aggregated counts instead of occurrences")
    ap.add_argument("--metrics-dir", default=None, help="lineage/metrics JSONL dir")
    ap.add_argument(
        "--memory-budget-mb",
        type=int,
        default=None,
        help="per-task kernel memory budget; sizes chunk cap AND the Arrow "
        "batch rows via the memory planner (plans/memory.py)",
    )
    args = ap.parse_args()

    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = SparkSession.builder.appName(f"ehs-enriched-k{args.k}").getOrCreate()

    from epichypersketch_jl_spark.config import HyperSketchConfig
    from epichypersketch_jl_spark.metrics import write_run_log
    from epichypersketch_jl_spark.operators.motif import (
        build_motif_cms,
        enriched_configurations,
        motif_counts,
    )

    cfg = HyperSketchConfig(
        motif_size=args.k,
        min_count=args.min_count,
        delta=args.delta,
        epsilon=args.epsilon,
        filter_len=args.filter_len if args.mode == "conv" else 0,
        seed=args.seed,
        conservative=args.conservative,
        memory_budget_bytes=(
            args.memory_budget_mb * (1 << 20) if args.memory_budget_mb else None
        ),
    )
    df = spark.read.parquet(args.input)
    if args.mode == "ordinary" and "positions" in df.columns:
        df = df.drop("positions")

    if cfg.memory_budget_bytes is not None:
        # resolve the plan ONCE (resolve_plan clears the budget so
        # planned_config inside the pipeline doesn't re-run the
        # typical-length job twice more per submit) and apply the Arrow
        # batch sizing session-wide
        from epichypersketch_jl_spark.plans.memory import resolve_plan

        cfg, plan = resolve_plan(df, cfg, conv=(args.mode == "conv"))
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(plan.arrow_batch_rows)
        )

    cms, task_metrics = build_motif_cms(
        df, cfg, checkpoint_dir=args.checkpoint_dir, n_buckets=args.n_buckets
    )
    if args.metrics_dir:
        write_run_log(
            args.metrics_dir,
            run_id=uuid.uuid4().hex[:12],
            job="enriched_configs",
            input_desc=args.input,
            config=cfg,
            task_metrics=task_metrics,
            sketch_meta={
                "depth": cms.depth,
                "width": cms.width,
                "n_updates": cms.n_updates,
                "conservative": cms.conservative,
            },
        )
    if args.summary:
        out = motif_counts(df, cfg, cms=cms)
    else:
        out = enriched_configurations(df, cfg, cms=cms, validate=False)
    out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
