"""Batch as-of join: for every left row, the single most recent right row
at-or-before its timestamp (per key), optionally within a tolerance.

The classic training-pipeline temporal primitive (feature lookup at event
time, attribution to the latest touchpoint, last-known-state join).  The
reference engine has no join at all (COVERAGE.md "absent-by-design");
Spark has no ASOF JOIN operator either, so this re-expresses it in the
plan shape that scales:

    union(tagged left, tagged right)
      -> one hash shuffle on the key
      -> per-key sort (ts, side-tag, tiebreak)
      -> running last(right_payload, ignorenulls) window

instead of the naive range join (left x right ON key AND r.ts <= l.ts
with a row_number filter), whose intermediate explodes as
|left per key| x |right per key| — quadratic in key density.  The window
form moves each row exactly once and its state is one payload struct per
key; AQE handles moderately skewed keys, and the same shape is what
streaming/joins.py uses with a watermark for the unbounded case.

Tie semantics (pinned, oracle-exact): a right row at exactly the left
timestamp matches ("at or before"); among right rows sharing that best
timestamp the one with the greatest `tiebreak` column wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import InputError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str,
    tolerance=None,
) -> DataFrame:
    """Left as-of join.  Returns every left row plus, for each of
    `right_cols`, a `<col>_asof` column from the matched right row (NULL
    when no right row at-or-before the left timestamp exists within
    `tolerance`).

    tolerance: optional Column/SQL-interval-string; a match older than
    left_ts - tolerance is discarded (the row still survives, unmatched).
    """
    on = [on] if isinstance(on, str) else list(on)
    for c in on + [right_ts, tiebreak, *right_cols]:
        if c not in right.columns:
            raise InputError(f"asof_join: right side lacks column {c!r}")
    if left_ts not in left.columns:
        raise InputError(f"asof_join: left side lacks column {left_ts!r}")
    payload_cols = list(dict.fromkeys([right_ts, tiebreak] + list(right_cols)))

    # a right row with a NULL timestamp has no position on the time axis:
    # without this filter it sorts NULLS FIRST and would match as if it
    # preceded everything (left rows with NULL left_ts stay, sort first,
    # find no earlier right row, and come out unmatched)
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tie"),
        F.struct(*payload_cols).alias("_rrow"),
        F.lit(None).cast(left.select(F.struct("*")).schema[0].dataType).alias("_lrow"),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_rrow"].dataType).alias("_rrow"),
        F.struct("*").alias("_lrow"),
    )
    # right rows sort before left rows at equal _ts (inclusive match) and
    # ascending _tie makes the running last() the max-tiebreak winner among
    # right rows sharing the best timestamp
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rrow", ignorenulls=True).over(w)
    j = r.unionByName(l).select("_tag", "_ts", "_lrow", matched.alias("_m"))
    j = j.filter(F.col("_tag") == 1)
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        j = j.withColumn(
            "_m",
            F.when(F.col("_m")[right_ts] >= F.col("_ts") - tol, F.col("_m")),
        )
    out = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out += [F.col(f"_m.{c}").alias(f"{c}_asof") for c in payload_cols]
    return j.select(*out)
