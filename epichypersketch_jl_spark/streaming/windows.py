"""Structured-Streaming windowed aggregations with watermarks.

The reference has no streaming constructs at all (SURVEY.md §2); these are
the standard Spark building blocks a training-data/event pipeline needs,
exposed with the same config discipline as the sketch operators:

  * windowed_event_counts — tumbling/sliding window counts per key with a
    watermark bounding late data (drops state for windows older than the
    watermark; append output mode emits each window exactly once, when
    finalized);
  * streaming_hll_per_window — distinct-user estimates per window via
    approx_count_distinct (Spark's native HLL++), the streaming analog of
    operators/cardinality.hll_distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) window counts per key.

    With append output mode a window row is emitted once, after the
    watermark passes its end — late rows beyond `watermark` are dropped,
    bounding state size (the scale requirement for unbounded streams).
    """
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def streaming_hll_per_window(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    rsd: float = 0.01,
) -> DataFrame:
    """Approximate distinct values per window (native HLL++ aggregate —
    mergeable inside Spark's streaming state store, so this is the
    streaming-safe form of a distinct count)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(F.approx_count_distinct(value_col, rsd).alias("approx_distinct"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "approx_distinct",
        )
    )
