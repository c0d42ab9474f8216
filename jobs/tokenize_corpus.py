"""spark-submit entry point for the ingest ETL: raw documents -> the
pre-tokenized sequence table (doc_id, tokens, n_tok[, positions], source)
the engine's input_hint describes, plus the (w, tok) codebook.

This is the write-once step that the query-side cache automates for the
local testdata; at production scale it runs once per corpus drop:

    spark-submit --py-files dist/ehs.zip jobs/tokenize_corpus.py \
        --input /path/documents.parquet --output /path/sequences \
        --vocab-output /path/vocab [--strategy join] [--positions]

strategy: broadcast (driver codebook; bounded vocabularies), join
(shuffle-join tokenizer; unbounded web-scale vocabularies), or auto.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, source)")
    ap.add_argument("--output", required=True, help="tokenized sequences parquet")
    ap.add_argument("--vocab-output", default=None, help="(w, tok) codebook parquet")
    ap.add_argument("--strategy", choices=["auto", "broadcast", "join"], default="auto")
    ap.add_argument("--positions", action="store_true", help="emit 1-based positions")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = SparkSession.builder.appName("ehs-tokenize").getOrCreate()

    from epichypersketch_jl_spark.sources.tables import (
        VOCAB_BROADCAST_MAX,
        tokenize_with_broadcast_vocab,
        tokenize_with_vocab_join,
        vocab_table,
    )

    docs = spark.read.parquet(args.input)
    vdf = vocab_table(docs, args.text_col)
    n_vocab = vdf.count()
    if args.vocab_output:
        vdf.write.mode("overwrite").parquet(args.vocab_output)
    strategy = args.strategy
    if strategy == "auto":
        strategy = "broadcast" if n_vocab <= VOCAB_BROADCAST_MAX else "join"
    if strategy == "broadcast":
        vocab = [r.w for r in vdf.orderBy("tok").collect()]
        seq = tokenize_with_broadcast_vocab(
            docs, vocab, text_col=args.text_col, with_positions=args.positions
        )
    else:
        seq = tokenize_with_vocab_join(
            docs, vdf, text_col=args.text_col, with_positions=args.positions
        )
    seq.write.mode("overwrite").parquet(args.output)
    vdf.unpersist_source()
    print(f"tokenized -> {args.output} (vocab {n_vocab} words, strategy {strategy})")
    spark.stop()


if __name__ == "__main__":
    main()
