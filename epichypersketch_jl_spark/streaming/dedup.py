"""Streaming event-time deduplication.

The streaming face of operators/dedup.exact_dedup: drop repeated deliveries
of the same logical event (at-least-once sources, replayed files, retried
producers) with BOUNDED state — the core requirement the batch operator
cannot meet on an unbounded stream.

`dedup_stream` wraps `dropDuplicatesWithinWatermark`: a key is remembered
only until the event-time watermark passes its first-seen timestamp plus
the delay, so state size is proportional to the keys arriving within one
watermark horizon, never to the stream's lifetime key count.  Duplicates
arriving within the horizon are dropped exactly; a duplicate arriving
LATER than the watermark delay is by definition indistinguishable from a
new event (its state was reclaimed) — the standard streaming-dedup
contract, and the reason the watermark is the state-size dial.

The reference has no streaming constructs (SURVEY.md §2); this is part of
the Spark-first extension family in streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import InputError


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time dedup on `keys` with watermark-bounded state.

    Emits the FIRST arrival of each key (append mode); duplicates within
    the watermark horizon are dropped.  `ts_col` must be a timestamp
    column; the watermark both bounds state and defines the horizon
    within which duplicates are guaranteed caught.
    """
    if not keys:
        raise InputError("dedup_stream needs at least one key column")
    for c in keys + [ts_col]:
        if c not in stream.columns:
            raise InputError(f"dedup_stream: stream lacks column {c!r}")
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
