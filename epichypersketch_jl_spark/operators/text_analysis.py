"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All JVM-side (built-in functions, whole-stage codegen) — deliberately zero
Python in these paths; they exist to slot into the same pipelines as the
sketch operators without adding Arrow hops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the heuristic language ID.
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit", "zu", "ich"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_chars, n_distinct_words, avg_word_len_x100)."""
    words = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(words).cast("int").alias("n_words"),
        F.length(text_col).cast("int").alias("n_chars"),
        F.size(F.array_distinct(words)).cast("int").alias("n_distinct_words"),
        # integer fixed-point: average word length * 100 (oracle-exact)
        F.floor(
            F.lit(100)
            * (F.length(text_col) - F.size(words) + 1)
            / F.size(words)
        ).cast("long").alias("avg_word_len_x100"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Heuristic quality features (integer fixed-point for exactness):
    stopword ratio, type-token ratio, length buckets — the usual cheap
    quality gates applied before expensive dedup/model scoring."""
    stop = stopwords if stopwords is not None else LANG_PROFILES["en"]
    stop_lit = F.array(*[F.lit(w) for w in stop])
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_lit, w)))
    n_distinct = F.size(F.array_distinct(words))
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        n_stop.cast("int").alias("n_stopwords"),
        F.floor(F.lit(1000) * n_stop / n_words).cast("long").alias("stop_ratio_x1000"),
        F.floor(F.lit(1000) * n_distinct / n_words).cast("long").alias("ttr_x1000"),
        F.when(n_words < 20, F.lit("short"))
        .when(n_words < 60, F.lit("medium"))
        .otherwise(F.lit("long"))
        .alias("length_bucket"),
    )


def lang_id_heuristic(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit counts,
    'und' when every profile scores zero.  Deterministic tie-break by
    language code order en < de? — explicit CASE order: highest count wins,
    earlier alphabetical language wins ties."""
    words = F.split(F.lower(F.col(text_col)), " ")
    cols = [F.col(id_col)]
    for lang, prof in LANG_PROFILES.items():
        lit = F.array(*[F.lit(w) for w in prof])
        cols.append(
            F.size(F.filter(words, lambda w: F.array_contains(lit, w)))
            .cast("int")
            .alias(f"score_{lang}")
        )
    scored = df.select(*cols)
    langs = sorted(LANG_PROFILES)  # alphabetical tie-break
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"score_{l}") == best), F.lit(l)).otherwise(pred)
    return scored.withColumn("predicted_lang", pred)


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms
    (Robertson & Zaragoza 2009): score = Σ_t idf_t · tf·(k1+1) /
    (tf + k1·(1−b + b·dl/avgdl)), idf_t = ln((N−df_t+0.5)/(df_t+0.5)+1).

    Returns (id, dl, tf_0..tf_{m-1}, score).  Two-scan plan, zero joins:
    the first aggregate reduces the corpus to |query_terms|+2 numbers
    (N, Σdl, per-term document frequency) collected once and folded into
    the scoring expression as LITERALS — the broadcast-the-small-side
    discipline without even a broadcast — and the second pass scores every
    document in one whole-stage-codegen projection.  The expression tree
    (literal values and operation order) is written to be reproducible
    verbatim in ANSI SQL, so the driver oracle can recompute the floating
    score bit-for-bit.
    """
    import math

    from ..errors import InputError

    if not query_terms:
        raise InputError("bm25_scores needs at least one query term")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), words.alias("ws")
    )
    aggs = [F.count("*").alias("n_docs"), F.sum(F.size("ws")).alias("total_len")]
    for i, t in enumerate(query_terms):
        aggs.append(
            F.sum(F.array_contains("ws", F.lit(t)).cast("long")).alias(f"df{i}")
        )
    stats = base.agg(*aggs).first()
    if not stats.n_docs:
        raise InputError("bm25_scores over an empty corpus")
    n, avgdl = stats.n_docs, stats.total_len / stats.n_docs
    dl = F.size("ws")
    k1p1, one_minus_b = k1 + 1.0, 1.0 - b
    cols = [F.col(id_col), dl.cast("long").alias("dl")]
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        # lambda-free term frequency: several higher-order-function lambdas
        # in one projection miscompile their element comparisons (the
        # second lambda's variable resolves against the first's type), so
        # count occurrences by set difference instead
        tf = F.size("ws") - F.size(F.array_remove("ws", t))
        cols.append(tf.cast("long").alias(f"tf_{i}"))
        idf = math.log((n - stats[f"df{i}"] + 0.5) / (stats[f"df{i}"] + 0.5) + 1.0)
        score = score + (F.lit(idf) * (tf * F.lit(k1p1))) / (
            tf + F.lit(k1) * (F.lit(one_minus_b) + (F.lit(b) * dl) / F.lit(avgdl))
        )
    return base.select(*cols, score.alias("score"))


def token_entropy(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str | None = None,
) -> DataFrame:
    """Shannon entropy of the token (or any value) distribution, overall
    or per group: H = -sum p ln p with p = c_v / T — the corpus-diversity
    diagnostic (a source whose entropy collapses is repeating itself;
    compare against ln(n_distinct), the maximum).

    Returns (group?, n_values: long, n_distinct: long, entropy_fp_sum:
    long, entropy: double).  Same exactness discipline as the bigram LM:
    the per-distinct-value term ln(c/T) quantizes to 1e-9 fixed point
    BEFORE the weighted integer sum, so entropy_fp_sum is order-free and
    SQL-recomputable; entropy = -entropy_fp_sum / (T * 1e9).  (c·lp fits
    int64 while c·ln(T/c) < ~9e9, i.e. any group below ~4e8 values —
    beyond that, drop the quantization scale.)  Pure Catalyst: explode,
    two aggregates, no Python."""
    is_list = df.schema[value_col].dataType.typeName() == "array"
    v = F.explode(value_col) if is_list else F.col(value_col)
    gexpr = (
        F.coalesce(F.col(group_col).cast("string"), F.lit("None"))
        if group_col is not None
        else F.lit("__all__")
    )
    vals = df.select(gexpr.alias("group"), v.alias("v")).filter(
        F.col("v").isNotNull()
    )
    cnt = vals.groupBy("group", "v").agg(F.count("*").alias("c"))
    tot = vals.groupBy("group").agg(F.count("*").alias("t"))
    term = cnt.join(tot, "group").select(
        "group",
        "c",
        "t",
        (
            F.col("c")
            * F.floor(
                F.log(F.col("c").cast("double") / F.col("t").cast("double"))
                * F.lit(1000000000.0)
            )
        ).alias("clp"),
    )
    out = term.groupBy("group").agg(
        F.first("t").alias("n_values"),
        F.count("*").alias("n_distinct"),
        (-F.sum("clp")).alias("entropy_fp_sum"),
    )
    out = out.select(
        "group",
        "n_values",
        "n_distinct",
        "entropy_fp_sum",
        (
            F.col("entropy_fp_sum")
            / (F.col("n_values") * F.lit(1000000000.0))
        ).alias("entropy"),
    )
    if group_col is not None:
        return out.withColumnRenamed("group", group_col)
    return out.drop("group")


def token_kl_vs_corpus(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """KL divergence of each group's token distribution from the pooled
    corpus distribution: KL(p_g || q) = sum_v p ln(p/q) with p = c/t
    (group) and q = C/T (corpus) — the drift diagnostic that catches a
    filter, a split, or an ingest source skewing the token distribution.
    Always finite: the corpus pool contains every group's tokens, so
    q > 0 wherever p > 0.

    Returns (group, n_values: long, kl_fp_sum: long, kl: double) with
    the same order-free fixed-point discipline as token_entropy: the
    per-distinct-value term ln((c/t)/(C/T)) quantizes to 1e-9 fixed
    point before the weighted integer sum, so kl_fp_sum is
    SQL-recomputable; kl = kl_fp_sum / (t * 1e9)."""
    is_list = df.schema[value_col].dataType.typeName() == "array"
    v = F.explode(value_col) if is_list else F.col(value_col)
    gexpr = F.coalesce(F.col(group_col).cast("string"), F.lit("None"))
    vals = df.select(gexpr.alias("group"), v.alias("v")).filter(
        F.col("v").isNotNull()
    )
    cnt = vals.groupBy("group", "v").agg(F.count("*").alias("c"))
    tot = vals.groupBy("group").agg(F.count("*").alias("t"))
    corpus = vals.groupBy("v").agg(F.count("*").alias("cc"))
    t_all = vals.count()
    term = (
        cnt.join(tot, "group")
        .join(corpus, "v")  # vocab-sized; AQE broadcasts while it fits
        .select(
            "group",
            "c",
            "t",
            (
                F.col("c")
                * F.floor(
                    F.log(
                        (F.col("c").cast("double") / F.col("t").cast("double"))
                        / (F.col("cc").cast("double") / F.lit(float(t_all)))
                    )
                    * F.lit(1000000000.0)
                )
            ).alias("clp"),
        )
    )
    return (
        term.groupBy("group")
        .agg(
            F.first("t").alias("n_values"),
            F.sum("clp").alias("kl_fp_sum"),
        )
        .select(
            F.col("group").alias(group_col),
            "n_values",
            "kl_fp_sum",
            (
                F.col("kl_fp_sum") / (F.col("n_values") * F.lit(1000000000.0))
            ).alias("kl"),
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp_md5, fp_sorted_md5): exact content fingerprint and a
    word-order-insensitive variant (md5 of sorted words)."""
    words = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(words))).alias("fp_sorted_md5"),
    )


def repetition_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Within-document n-gram repetition — the standard degenerate-text
    gate (boilerplate loops, keyboard mash, template spam score high).

    Returns (id_col, n_ngrams: long, n_distinct: long, rep_x1000: long)
    for every doc with at least one n-gram, where rep_x1000 =
    floor(1000 * (n_ngrams - n_distinct) / n_ngrams) — 0 for fully
    distinct text, ~1000 for one phrase repeated forever.  Integer fixed
    point keeps the score SQL-hash-exact.  Pure per-row Catalyst (the
    shingle arrays never leave their row): map-only at any scale."""
    from .dedup import word_shingles

    sh = word_shingles(df.select(id_col, text_col), text_col, n)
    total = F.size("shingles").cast("long")
    dist = F.size(F.array_distinct("shingles")).cast("long")
    return (
        sh.select(
            F.col(id_col),
            total.alias("n_ngrams"),
            dist.alias("n_distinct"),
        )
        .filter(F.col("n_ngrams") >= 1)
        .withColumn(
            "rep_x1000",
            F.floor(
                F.lit(1000) * (F.col("n_ngrams") - F.col("n_distinct")) / F.col("n_ngrams")
            ).cast("long"),
        )
    )


def ngram_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hash_join_key: bool = True,
) -> DataFrame:
    """Train/eval contamination check — for each eval doc, how many of its
    distinct word n-grams appear ANYWHERE in the training corpus.  The
    canonical benchmark-leakage audit for a training-data pipeline.

    Returns (id_col, n_distinct_ngrams: long, n_contaminated: long,
    contamination_x1000: long) per eval doc with >= 1 n-gram.

    Plan — one linear chain: the train side reduces to its DISTINCT
    n-gram set (shuffle bounded by distinct n-grams, never rows), the
    eval side explodes to (doc, n-gram) rows, one left join marks hits,
    one map-side-combined aggregate counts.  Each intermediate has
    exactly one consumer (the lesson of the LSH candidate plan).

    With hash_join_key (default), both sides project the shingle to
    xxhash64 BEFORE the exchange, so the distinct + join shuffle ships
    8-byte keys instead of n-word strings — the difference between a
    tractable and an oversized exchange on a web corpus.  Counts are
    collision-equivalent (~2^-64 per colliding pair); hash_join_key=False
    keeps raw-string keys for audit."""
    from .dedup import word_shingles

    key = (lambda c: F.xxhash64(c)) if hash_join_key else (lambda c: F.col(c))
    tr = (
        word_shingles(train_df.select(text_col), text_col, n)
        .select(F.explode("shingles").alias("__s0"))
        .select(key("__s0").alias("s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ev = (
        word_shingles(eval_df.select(id_col, text_col), text_col, n)
        .select(F.col(id_col), F.explode(F.array_distinct("shingles")).alias("__s0"))
        .select(id_col, key("__s0").alias("s"))
    )
    return (
        ev.join(tr, "s", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_distinct_ngrams"),
            F.count("__hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_x1000",
            F.floor(
                F.lit(1000) * F.col("n_contaminated") / F.col("n_distinct_ngrams")
            ).cast("long"),
        )
    )
