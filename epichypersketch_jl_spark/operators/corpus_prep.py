"""Corpus-preparation operators for training-data pipelines: context-window
chunking and deterministic dataset splitting.

These sit downstream of cleaning/dedup and upstream of tokenizer training:
long documents must be cut into model-context-sized windows (with overlap so
no span of text is only ever seen truncated), and the corpus must be split
into train/validation/test sets deterministically — re-running the pipeline
on a grown corpus must never move an old document across splits, which rules
out randomness and ordering and leaves content hashing.

Everything here is pure Catalyst expression (split / slice / sequence /
posexplode / xxhash64) — zero Python in the data path, whole-stage codegen
end to end, embarrassingly parallel (no shuffle, no state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import InputError


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into word windows of at most `max_words`, with
    consecutive windows sharing `overlap` words (stride = max_words -
    overlap).  Returns one row per chunk: (doc_id, chunk_id, chunk_text,
    n_words).

    Window layout: a document of n words yields 1 chunk when n <= max_words,
    else 1 + ceil((n - max_words) / stride) chunks starting at 0, stride,
    2*stride, ...; the last chunk is the only one allowed to be shorter than
    max_words.  Deterministic, order-preserving within a document, and
    row-local — the plan is a single projection + generator, no shuffle, so
    it scales linearly with corpus size and is safe at any document length
    (`sequence` materializes only n_chunks ints per row, not the windows).
    Every input row yields at least one chunk, so no document silently
    disappears downstream (whitespace-split semantics: an empty text is a
    single one-element chunk, matching SQL string_split).
    """
    if max_words <= 0:
        raise InputError(f"max_words must be positive, got {max_words}")
    if not 0 <= overlap < max_words:
        raise InputError(
            f"overlap must be in [0, max_words), got overlap={overlap} "
            f"max_words={max_words}"
        )
    stride = max_words - overlap
    # NULL text would propagate through split -> sequence -> posexplode and
    # silently DROP the row; coalesce keeps the every-row-yields-a-chunk
    # invariant (NULL behaves like empty text)
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(words)
    n_chunks = F.when(n <= max_words, F.lit(1)).otherwise(
        (F.lit(1) + F.ceil((n - F.lit(max_words)) / F.lit(stride))).cast("int")
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            words.alias("_w"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_z"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice(F.col("_w"), F.col("chunk_id") * stride + 1, max_words), " "
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("_w"), F.col("chunk_id") * stride + 1, max_words)
            ).alias("n_words"),
        )
    )


def stable_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Assign each row to a named split (train/valid/test by default) by
    hashing its id: bucket = pmod(xxhash64(id, seed), 10_000), and the
    fractions carve [0, 10_000) into contiguous ranges.  Returns the input
    plus a `split` string column.

    Content-hash assignment is the only scheme that survives a growing
    corpus: a document's split depends on nothing but (id, seed), so
    re-ingesting with more data never leaks yesterday's test docs into
    today's train set, and the assignment is identical under any
    partitioning or row order.  Fractions are exact over hash buckets, so
    realized sizes converge to the requested fractions at corpus scale
    (binomial concentration), not row-exactly — row-exact splitting would
    require a global sort.
    """
    if fractions is None:
        fractions = {"train": 0.98, "valid": 0.01, "test": 0.01}
    if not fractions:
        raise InputError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise InputError(f"fractions must sum to 1.0, got {total}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    expr: Column | None = None
    hi = 0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        hi += int(round(frac * 10_000))
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
