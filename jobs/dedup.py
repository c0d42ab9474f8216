"""spark-submit entry point for the dedup family.

    spark-submit --py-files dist/ehs.zip jobs/dedup.py \
        --input docs.parquet --method minhash --threshold 0.5 --output out/
    methods: exact | jaccard | minhash | simhash | resolve
    (resolve = minhash pairs -> connected components -> keeper election;
     one row per doc with is_keeper, the end-to-end dedup pass)
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--method",
        choices=["exact", "jaccard", "minhash", "simhash", "resolve"],
        required=True,
    )
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument(
        "--max-shingle-df",
        type=int,
        default=None,
        help="jaccard: stop-shingle DF cap for the candidate index "
        "(0/None = exhaustive; at web scale pass ~1000 and route exact "
        "duplicates through --method exact first)",
    )
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = SparkSession.builder.appName(f"ehs-dedup-{args.method}").getOrCreate()
    df = spark.read.parquet(args.input)

    from epichypersketch_jl_spark.operators import dedup as D

    if args.method == "exact":
        out = D.exact_dedup(df, text_col=args.text_col, id_col=args.id_col)
    elif args.method == "jaccard":
        out = D.ngram_jaccard_pairs(
            df, text_col=args.text_col, id_col=args.id_col, n=args.ngram,
            threshold=args.threshold,
            max_shingle_df=args.max_shingle_df or None,
        )
    elif args.method == "minhash":
        out = D.minhash_lsh_pairs(
            df, text_col=args.text_col, id_col=args.id_col, n=args.ngram,
            num_perm=args.num_perm, bands=args.bands, seed=args.seed,
            threshold=args.threshold,
        )
    elif args.method == "resolve":
        # full dedup pass: MinHash-LSH pairs -> connected components ->
        # keeper per cluster; one row per input doc, filter is_keeper to drop
        pairs = D.minhash_lsh_pairs(
            df, text_col=args.text_col, id_col=args.id_col, n=args.ngram,
            num_perm=args.num_perm, bands=args.bands, seed=args.seed,
            threshold=args.threshold,
        )
        out = D.resolve_duplicate_clusters(df, pairs, id_col=args.id_col)
    else:
        out = D.simhash_near_pairs(
            df, text_col=args.text_col, id_col=args.id_col,
            max_hamming=args.max_hamming, seed=args.seed,
        )
    out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
