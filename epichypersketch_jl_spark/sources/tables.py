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
    """documents.parquet -> (doc_id, tokens, n_tok, source[, positions]).

    Token id = 1-based rank in the sorted vocab, computed vectorized in an
    Arrow kernel (np.searchsorted over the sorted codebook) — equivalent to
    dense_rank in SQL, identical ids, and independent of JVM codegen warm-up
    (an earlier array_position-per-token expression paid multi-second JIT
    cost on first execution).
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    if vocab is None:
        vocab = build_vocab(docs)
    vocab_arr = np.array(vocab)

    fields = [
        docs.schema["doc_id"],
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        docs.schema["source"],
    ]
    if with_positions:
        fields.insert(3, StructField("positions", ArrayType(IntegerType(), False), False))
    schema = StructType(fields)

    def fn(batches):
        import pyarrow.compute as pc

        for batch in batches:
            words = pc.split_pattern(batch.column("text"), " ")
            offsets = words.offsets.to_numpy().astype(np.int64)
            flat = words.values.to_numpy(zero_copy_only=False).astype(str)
            flat = flat[offsets[0] : offsets[-1]]  # align with (possibly sliced) offsets
            offsets = offsets - offsets[0]
            # drop empty words (doubled/leading/trailing spaces): the vocab
            # excludes '' so they must not be tokenized; oracle SQL filters
            # them identically (w != '')
            keep = flat != ""
            if not keep.all():
                cs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
                lens = cs[offsets[1:]] - cs[offsets[:-1]]
                flat = flat[keep]
                offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            ids = (np.searchsorted(vocab_arr, flat) + 1).astype(np.int32)
            off32 = offsets.astype(np.int32)
            toks = pa.ListArray.from_arrays(pa.array(off32), pa.array(ids))
            lens = np.diff(offsets).astype(np.int32)
            cols = {
                "doc_id": batch.column("doc_id"),
                "tokens": toks,
                "n_tok": pa.array(lens),
            }
            if with_positions:
                pos_flat = (
                    np.arange(offsets[-1] - offsets[0], dtype=np.int32)
                    - np.repeat(off32[:-1], lens)
                    + 1
                )
                cols["positions"] = pa.ListArray.from_arrays(pa.array(off32), pa.array(pos_flat))
            cols["source"] = batch.column("source")
            yield pa.RecordBatch.from_pydict(cols)

    return docs.mapInArrow(fn, schema)
