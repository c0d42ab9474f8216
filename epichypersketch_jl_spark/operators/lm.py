"""Corpus-level n-gram language-model scoring — the perplexity-style
quality gate a training-data pipeline runs before expensive model-based
filtering: score each document by the average log-probability of its
adjacent token bigrams under the corpus's own bigram counts.  Documents
full of unusual transitions (boilerplate, shuffled text, OCR noise)
score low; fluent text scores high.

Design for exactness AND scale:
  * bigram/unigram count tables are exact Catalyst aggregates over
    adjacent (position-ordered) token pairs;
  * the per-pair value ln(c_ab / c_a) is quantized to 1e-9 FIXED POINT
    BEFORE any summation, so the per-doc score is an INTEGER sum —
    order-free, partition-invariant, and reproducible bit-for-bit in
    ANSI SQL (float summation order would otherwise break parity);
  * the count tables aggregate to O(min(V^2, corpus pairs)) rows; the
    join back to the pair stream is left to the optimizer (AQE
    broadcasts it while it fits and falls back to a shuffle join when a
    web-scale vocabulary makes the bigram table itself large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import InputError


def _adjacent_pairs(
    df: DataFrame, tokens_col: str, positions_col: str, id_col: str
) -> DataFrame:
    """(id, a, b): each doc's adjacent token pairs in POSITION order.
    The position sort is defensive normalization — the cached sequences
    table already stores word order, but rows that passed through the
    motif pipeline's canonical per-id sort (or any re-ordering) still
    produce correct bigrams.  Docs with fewer than 2 tokens are filtered
    here (F.sequence(0, n-2) would otherwise descend and index 0)."""
    ordered = F.transform(
        F.array_sort(F.arrays_zip(F.col(positions_col), F.col(tokens_col))),
        lambda s: s[tokens_col],
    )
    n = F.size(F.col(tokens_col))
    pairs = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.struct(
            F.element_at(ordered, i + 1).alias("a"),
            F.element_at(ordered, i + 2).alias("b"),
        ),
    )
    return (
        df.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )


def bigram_logprob(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    positions_col: str = "positions",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's own
    bigram model: score = (1/(n-1)) * sum ln(c_ab / c_a) over the doc's
    adjacent pairs, where c_ab counts the bigram corpus-wide and c_a
    counts token a in non-final position (so p(b|a) sums to 1).

    Returns (id, n_pairs: long, logprob_fp_sum: long, avg_logprob:
    double) — logprob_fp_sum is the exact integer sum of per-pair
    floor(ln(p)*1e9) values and is the column to compare engines on;
    avg_logprob = logprob_fp_sum / (n_pairs * 1e9) is the human-readable
    form.  Docs with fewer than 2 tokens are excluded (no bigrams)."""
    for c in (tokens_col, positions_col, id_col):
        if c not in df.columns:
            raise InputError(f"bigram_logprob: input lacks column {c!r}")
    pairs = _adjacent_pairs(df, tokens_col, positions_col, id_col)
    bi = pairs.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    # c_a = count of a in non-final position = sum of its bigram counts:
    # derived from the (small) bigram table, not a third corpus pass
    first = bi.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    # quantize per DISTINCT pair, then integer-sum per doc: no float
    # accumulation anywhere, so the result is order- and partition-free
    lut = bi.join(first, "a").select(
        "a",
        "b",
        F.floor(
            F.log(F.col("c_ab").cast("double") / F.col("c_a").cast("double"))
            * F.lit(1000000000.0)
        ).alias("lp_fp"),
    )
    return (
        pairs.join(lut, ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("lp_fp").alias("logprob_fp_sum"),
        )
        .select(
            id_col,
            "n_pairs",
            "logprob_fp_sum",
            (
                F.col("logprob_fp_sum")
                / (F.col("n_pairs") * F.lit(1000000000.0))
            ).alias("avg_logprob"),
        )
    )
