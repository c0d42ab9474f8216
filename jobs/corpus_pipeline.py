"""spark-submit entry point for the COMPOSED training-data pipeline:

    raw documents
      -> quality gate   (cheap JVM heuristics: stopword ratio, length)
      -> exact dedup    (hash groupBy keeper election)
      -> near-dup resolve (MinHash-LSH pairs -> connected components ->
                           keeper election; is_keeper=false rows dropped)
      -> stable split   (content-hash train/valid/test)
      -> chunking       (context-window word slices with overlap)
      -> chunked parquet per split

    spark-submit --py-files dist/ehs.zip jobs/corpus_pipeline.py \
        --input docs.parquet --output corpus/ \
        [--min-words 5] [--max-stop-ratio 900] [--threshold 0.5] \
        [--max-words 512] [--overlap 32] [--report report.json]

Each stage is one of the library operators the driver gate proves exact;
this job only sequences them.  Stage order is the cheap-to-expensive
discipline a 100-TB run needs: the quality gate (pure codegen projection)
and exact dedup (one hash shuffle) shrink the corpus before the near-dup
stage (banded candidate join) touches it, and chunking (row-local
explode) runs last on the surviving keepers only.  The per-stage row
counts land in --report for pipeline observability.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--output", required=True, help="output dir; chunks under split=<name>/")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-stop-ratio", type=int, default=900, help="x1000 fixed-point")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-words", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--train-frac", type=float, default=0.98)
    ap.add_argument("--valid-frac", type=float, default=0.01)
    ap.add_argument("--report", default=None, help="write per-stage counts JSON here")
    args = ap.parse_args()

    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = SparkSession.builder.appName("ehs-corpus-pipeline").getOrCreate()
    from epichypersketch_jl_spark.operators import dedup as D
    from epichypersketch_jl_spark.operators.corpus_prep import (
        chunk_documents,
        stable_split,
    )
    from epichypersketch_jl_spark.operators.text_analysis import quality_score

    from pyspark import StorageLevel

    counts: dict[str, int] = {}
    # each stage boundary is persisted so the per-stage observability
    # counts and the final write never recompute the upstream chain
    pinned: list = []

    def pin(df):
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(df)
        return df

    docs = pin(spark.read.parquet(args.input))
    counts["input"] = docs.count()

    # 1. quality gate — pure projection, no shuffle; join back on id keeps
    # arbitrary extra input columns intact
    q = quality_score(docs, text_col=args.text_col, id_col=args.id_col)
    keep_ids = q.filter(
        (F.col("n_words") >= args.min_words)
        & (F.col("stop_ratio_x1000") <= args.max_stop_ratio)
    ).select(args.id_col)
    docs = pin(docs.join(keep_ids, args.id_col))
    counts["after_quality_gate"] = docs.count()

    # 2. exact dedup — keep one doc per identical text
    exact = D.exact_dedup(docs, text_col=args.text_col, id_col=args.id_col)
    docs = pin(
        docs.join(
            exact.filter(F.col(args.id_col) == F.col("keep_doc_id")).select(
                args.id_col
            ),
            args.id_col,
        )
    )
    counts["after_exact_dedup"] = docs.count()

    # 3. near-dup resolution — banded MinHash-LSH candidates, exact verify,
    # transitive closure, deterministic keeper per cluster
    pairs = D.minhash_lsh_pairs(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        n=args.ngram,
        num_perm=args.num_perm,
        bands=args.bands,
        seed=args.seed,
        threshold=args.threshold,
    )
    resolved = D.resolve_duplicate_clusters(docs, pairs, id_col=args.id_col)
    docs = pin(
        docs.join(
            resolved.filter(F.col("is_keeper"))
            .select(F.col("doc_id").alias(args.id_col)),
            args.id_col,
        )
    )
    counts["after_neardup_resolve"] = docs.count()

    # 4. chunking + 5. stable split — both row-local, no shuffle; the split
    # is a pure function of doc_id, so assigning it per CHUNK row after the
    # explode gives every chunk of a document the same split without a join
    test_frac = max(0.0, 1.0 - args.train_frac - args.valid_frac)
    chunks = stable_split(
        chunk_documents(
            docs,
            text_col=args.text_col,
            id_col=args.id_col,
            max_words=args.max_words,
            overlap=args.overlap,
        ),
        id_col="doc_id",
        fractions={
            "train": args.train_frac,
            "valid": args.valid_frac,
            "test": test_frac,
        },
        seed=args.seed,
    )
    chunks.write.mode("overwrite").partitionBy("split").parquet(args.output)
    out = spark.read.parquet(args.output)
    counts["chunks_written"] = out.count()
    for r in out.groupBy("split").count().collect():
        counts[f"chunks_{r['split']}"] = r["count"]

    print(json.dumps(counts))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(counts, f, indent=1)
    for df in pinned:
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
