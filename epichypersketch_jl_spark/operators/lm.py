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


def _adjacent_triples(
    df: DataFrame, tokens_col: str, positions_col: str, id_col: str
) -> DataFrame:
    """(id, a, b, c): each doc's adjacent token triples in POSITION order
    (same normalization as _adjacent_pairs).  Docs with fewer than 3
    tokens are filtered."""
    ordered = F.transform(
        F.array_sort(F.arrays_zip(F.col(positions_col), F.col(tokens_col))),
        lambda s: s[tokens_col],
    )
    n = F.size(F.col(tokens_col))
    trips = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.struct(
            F.element_at(ordered, i + 1).alias("a"),
            F.element_at(ordered, i + 2).alias("b"),
            F.element_at(ordered, i + 3).alias("c"),
        ),
    )
    return (
        df.filter(n >= 3)
        .select(F.col(id_col), F.explode(trips).alias("t"))
        .select(
            id_col,
            F.col("t.a").alias("a"),
            F.col("t.b").alias("b"),
            F.col("t.c").alias("c"),
        )
    )


def trigram_logprob(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    positions_col: str = "positions",
    id_col: str = "doc_id",
    lambdas: tuple[float, float, float] = (0.7, 0.2, 0.1),
) -> DataFrame:
    """Per-document trigram log-probability with INTERPOLATED BACKOFF
    (Jelinek-Mercer): for each adjacent triple (a, b, c),

        p(c | a, b) = l3 * c_abc/c_ab  +  l2 * c_bc/c_b  +  l1 * c_c/N

    where c_abc counts the trigram corpus-wide, c_ab counts (a, b) in
    non-final-pair position (so the trigram term normalizes), c_bc / c_b
    are the corpus bigram model's counts (exactly bigram_logprob's), and
    c_c / N is the unigram relative frequency.  Because every document's
    trigram has a seen context by construction (the model is trained on
    the corpus being scored), interpolation here smooths rather than
    rescues — but the estimator is the standard one a held-out scorer
    would use, and l1 > 0 guarantees p > 0 always.

    Same exactness discipline as bigram_logprob: p is computed per
    DISTINCT triple, floor(ln(p)*1e9) quantizes it to fixed point, and
    only INTEGERS are summed per doc — order-free, partition-invariant,
    reproducible in ANSI SQL.  The count tables are
    O(min(V^3, corpus trigrams)) aggregated rows; AQE picks broadcast vs
    shuffle for the LUT join.  Returns (id, n_triples: long,
    logprob_fp_sum: long, avg_logprob: double); docs with fewer than 3
    tokens are excluded.
    """
    for c in (tokens_col, positions_col, id_col):
        if c not in df.columns:
            raise InputError(f"trigram_logprob: input lacks column {c!r}")
    l3, l2, l1 = (float(x) for x in lambdas)
    if min(l3, l2, l1) < 0 or abs(l3 + l2 + l1 - 1.0) > 1e-9 or l1 == 0:
        raise InputError(
            f"lambdas must be non-negative, sum to 1, and have l1 > 0: {lambdas}"
        )
    triples = _adjacent_triples(df, tokens_col, positions_col, id_col)
    pairs = _adjacent_pairs(df, tokens_col, positions_col, id_col)
    tri = triples.groupBy("a", "b", "c").agg(F.count("*").alias("c_abc"))
    ctx2 = tri.groupBy("a", "b").agg(F.sum("c_abc").alias("c_ab"))
    bi = pairs.groupBy("a", "b").agg(F.count("*").alias("c_bc"))
    ctx1 = bi.groupBy("a").agg(F.sum("c_bc").alias("c_b"))
    uni = (
        df.select(F.explode(tokens_col).alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("c_c"))
    )
    n_total = int(df.select(F.sum(F.size(tokens_col))).first()[0] or 0)
    if n_total == 0:
        raise InputError("trigram_logprob: corpus has no tokens")
    # expression mirrors the SQL oracle term-for-term, left-associative:
    # ((l3*p3 + l2*p2) + l1*p1)
    p = (
        F.lit(l3) * (F.col("c_abc").cast("double") / F.col("c_ab").cast("double"))
        + F.lit(l2) * (F.col("c_bc").cast("double") / F.col("c_b").cast("double"))
        + F.lit(l1) * (F.col("c_c").cast("double") / F.lit(float(n_total)))
    )
    lut = (
        tri.join(ctx2, ["a", "b"])
        .join(
            bi.select(F.col("a").alias("b"), F.col("b").alias("c"), "c_bc"),
            ["b", "c"],
        )
        .join(ctx1.select(F.col("a").alias("b"), "c_b"), "b")
        .join(uni, "c")
        .select(
            "a",
            "b",
            "c",
            F.floor(F.log(p) * F.lit(1000000000.0)).alias("lp_fp"),
        )
    )
    return (
        triples.join(lut, ["a", "b", "c"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_triples"),
            F.sum("lp_fp").alias("logprob_fp_sum"),
        )
        .select(
            id_col,
            "n_triples",
            "logprob_fp_sum",
            (
                F.col("logprob_fp_sum")
                / (F.col("n_triples") * F.lit(1000000000.0))
            ).alias("avg_logprob"),
        )
    )


def kn_bigram_logprob(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    positions_col: str = "positions",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document bigram log-probability under KNESER-NEY smoothing —
    the standard state-of-the-art n-gram smoothing (Kneser & Ney 1995;
    Chen & Goodman 1999 empirical study):

        p_KN(b|a) = max(c_ab - D, 0)/c_a
                    + (D * N1+(a,.)/c_a) * (N1+(.,b) / B)

    where c_ab / c_a are the corpus bigram/context counts (exactly
    bigram_logprob's), N1+(a,.) counts a's DISTINCT continuations,
    N1+(.,b) counts b's distinct left-contexts (the continuation
    probability — "how promiscuous is b", not "how frequent"), and B is
    the number of distinct bigrams.  D in (0,1) is the absolute
    discount.

    The whole estimator is counts + one float literal, so the same
    fixed-point discipline applies: p is computed per DISTINCT pair with
    a left-associative IEEE expression tree mirrored verbatim in SQL,
    floor(ln(p)*1e9) quantizes, and per-doc scores are integer sums —
    order-free and bit-exact cross-engine.  Smoothing guarantees p > 0
    for every OBSERVED pair (the discounted term may hit zero but the
    continuation term cannot); like bigram_logprob, unseen pairs never
    occur because the model scores the corpus it was trained on.

    Returns (id, n_pairs: long, logprob_fp_sum: long, avg_logprob:
    double); docs with fewer than 2 tokens are excluded."""
    for c in (tokens_col, positions_col, id_col):
        if c not in df.columns:
            raise InputError(f"kn_bigram_logprob: input lacks column {c!r}")
    d = float(discount)
    if not (0.0 < d < 1.0):
        raise InputError(f"discount must be in (0, 1), got {discount}")
    pairs = _adjacent_pairs(df, tokens_col, positions_col, id_col)
    bi = pairs.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ctx = bi.groupBy("a").agg(
        F.sum("c_ab").alias("c_a"),
        F.count("*").alias("n1_fwd"),  # N1+(a, .)
    )
    back = bi.groupBy("b").agg(F.count("*").alias("n1_back"))  # N1+(., b)
    n_bigrams = int(bi.count())
    if n_bigrams == 0:
        raise InputError("kn_bigram_logprob: corpus has no bigrams")
    # left-associative, mirrored verbatim in the SQL oracle:
    # (greatest(c_ab - D, 0) / c_a) + ((D * n1_fwd) / c_a) * (n1_back / B)
    p = (
        F.greatest(F.col("c_ab").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c_a").cast("double")
        + (F.lit(d) * F.col("n1_fwd").cast("double"))
        / F.col("c_a").cast("double")
        * (F.col("n1_back").cast("double") / F.lit(float(n_bigrams)))
    )
    lut = (
        bi.join(ctx, "a")
        .join(back, "b")
        .select("a", "b", F.floor(F.log(p) * F.lit(1000000000.0)).alias("lp_fp"))
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
