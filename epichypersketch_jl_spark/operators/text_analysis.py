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


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp_md5, fp_sorted_md5): exact content fingerprint and a
    word-order-insensitive variant (md5 of sorted words)."""
    words = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(words))).alias("fp_sorted_md5"),
    )
