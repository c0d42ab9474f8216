"""Stream-stream interval join (event correlation).

The attribution shape every event pipeline needs: match each left event
(e.g. a view/impression) with right events (e.g. purchases/clicks) for the
same key whose event time falls in [left_ts, left_ts + max_delay].  Both
sides are watermarked so Spark can BOUND the join state: a buffered left
row becomes droppable once the right watermark passes left_ts + max_delay,
and a right row once the left watermark passes right_ts — without the time
range + watermarks, stream-stream state grows forever.  State size is
therefore O(events within watermark + max_delay), independent of stream
length, and the shuffle keys on the join key like any batch join.

Inner-join semantics: results are emitted as soon as both sides have
arrived (append mode, no emission delay); rows arriving later than the
watermark allows may be dropped, exactly like the batch-equivalence rule
for every other watermarked operator here (tests pin multi-batch ==
batch-join equality for in-watermark data via maxFilesPerTrigger=1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner interval join: rows (key, l_*, r_*) with
    left_ts <= right_ts <= left_ts + max_delay and equal keys.  Works on
    batch DataFrames too (the condition is ordinary Catalyst; watermarks
    are no-ops in batch), which is how the oracle pins it exactly."""
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    lsel = [F.col(key)] + [
        F.col(c).alias(f"{left_prefix}{c}") for c in l.columns if c != key
    ]
    rsel = [F.col(key).alias("__rkey")] + [
        F.col(c).alias(f"{right_prefix}{c}") for c in r.columns if c != key
    ]
    lp, rp = l.select(*lsel), r.select(*rsel)
    lt, rt = F.col(f"{left_prefix}{left_ts}"), F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delay}"))
    )
    return lp.join(rp, cond, "inner").drop("__rkey")
