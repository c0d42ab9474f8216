"""Source adapters.

The engine's native input is a pre-tokenized sequence table
(doc_id, tokens: array<int32>, n_tok, source) — BASELINE.json input_hint.
The reference takes an in-memory Dict and has no I/O layer at all
(src/errors.jl:37-47 is its entire ingest surface); our scan goes through
`spark.read` so Catalyst gets column pruning + predicate pushdown for free.

`documents_sequences` adapts the driver's documents.parquet (raw text) into
that shape with a deterministic tokenizer: token id = 1-based rank of the
word in the sorted global vocabulary.  Properties that matter:
  * identical ids are derivable in ANSI SQL (dense_rank over sorted distinct
    words) — used by the DuckDB oracles;
  * ids >= 1, matching the reference's "0 is reserved padding" convention
    (src/record.jl:159);
  * the per-token mapping runs JVM-side (`array_position` against a
    broadcast literal vocab) — no explode, no join, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (Iceberg-compatible schema; the sandbox has no Iceberg
    runtime jar, so the thin abstraction stays format-agnostic)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def build_vocab(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct whitespace words — the token-id codebook.

    One tiny aggregation job; the result is broadcast as a literal array.
    Bounded by language vocabulary size, so this stays driver-safe at scale
    (and real deployments feed pre-tokenized sequences anyway).
    """
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .orderBy("w")
        .collect()
    )
    return [r.w for r in rows]


def documents_sequences(
    spark: SparkSession,
    sf_dir: str,
    *,
    with_positions: bool = False,
    vocab: list[str] | None = None,
) -> DataFrame:
    """documents.parquet -> (doc_id, tokens, n_tok, source[, positions])."""
    docs = read_table(spark, sf_dir, "documents")
    if vocab is None:
        vocab = build_vocab(docs)
    lit_vocab = F.array(*[F.lit(w) for w in vocab])
    words = F.split(F.col("text"), " ")
    tokens = F.transform(words, lambda w: F.array_position(lit_vocab, w).cast("int"))
    out = docs.select(
        F.col("doc_id"),
        tokens.alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        F.col("source"),
    )
    if with_positions:
        out = out.withColumn(
            "positions",
            F.sequence(F.lit(1), F.col("n_tok")).cast("array<int>"),
        )
    return out
