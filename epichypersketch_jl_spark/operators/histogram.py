"""Exact value histograms — the distribution diagnostic next to the
quantile sketches: where KLL/t-digest answer "what value sits at rank q",
the histogram answers "how much mass sits in each bucket", exactly, in one
Catalyst aggregate.

Two bucket laws:
  * log2 — bucket = floor(log2(v)) for v >= 1, computed INTEGER-exactly as
    length(bin(v)) - 1 (the binary-representation string, identical in
    Spark SQL and DuckDB), so there is no libm/floor boundary risk at
    powers of two; the natural law for long-tailed size columns
    (document lengths, token counts, byte sizes).
  * linear — bucket = (v - lo) div width over [lo, lo + n_buckets*width),
    clamped to the edge buckets; pure integer arithmetic.

Plan: one groupBy over (group?, bucket) — map-side combined, shuffle
proportional to distinct (group, bucket) pairs, never rows.  At 100 TB a
histogram costs what a count(*) per group costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import InputError


def value_histogram(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str | None = None,
    mode: str = "log2",
    lo: int = 0,
    width: int = 1,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact histogram of an integral column, overall or per group.

    Returns (group_col?, bucket: long, bucket_lo: long, bucket_hi: long,
    n_values: long) ordered by (group?, bucket), where
    [bucket_lo, bucket_hi) is the bucket's value interval.

    mode="log2": bucket b holds values in [2^b, 2^(b+1)); values < 1 are
    EXCLUDED (no finite log bucket).  mode="linear": bucket b holds
    [lo + b*width, lo + (b+1)*width), with values outside
    [lo, lo + n_buckets*width) clamped into the first/last bucket
    (documented edge-bucket semantics — the standard clamped histogram).
    NULLs never count.
    """
    if value_col not in df.columns:
        raise InputError(f"value_histogram: input lacks column {value_col!r}")
    if group_col is not None and group_col not in df.columns:
        raise InputError(f"value_histogram: input lacks column {group_col!r}")
    if mode not in ("log2", "linear"):
        raise InputError(f"value_histogram: unknown mode {mode!r}")
    v = F.col(value_col).cast("long")
    if mode == "log2":
        src = df.where(v.isNotNull() & (v >= 1))
        # integer-exact floor(log2(v)): binary-string length - 1 — no
        # float log anywhere, so Spark and any SQL oracle agree on every
        # boundary (v = 2^k) by construction
        bucket = (F.length(F.bin(v)) - F.lit(1)).cast("long")
        b_lo = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
        b_hi = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) + 1)")
    else:
        if width < 1:
            raise InputError("value_histogram: linear mode needs width >= 1")
        if n_buckets < 1:
            raise InputError("value_histogram: n_buckets must be >= 1")
        src = df.where(v.isNotNull())
        # TRUE integer floor division: Spark's `/` on longs is double
        # division, which rounds across bucket boundaries once |v - lo|
        # exceeds 2^53; `div` truncates toward zero, so correct it by one
        # for negative numerators with a nonzero remainder (ADVICE r4)
        x = (v - F.lit(int(lo))).alias("__x")
        raw = F.expr(
            f"(__x div {int(width)}) - "
            f"(CASE WHEN __x % {int(width)} != 0 AND __x < 0 THEN 1 ELSE 0 END)"
        )
        bucket = F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(int(n_buckets - 1)).cast("long"), raw.cast("long")),
        )
        b_lo = F.lit(int(lo)) + F.col("bucket") * F.lit(int(width))
        b_hi = F.col("bucket_lo") + F.lit(int(width))
    sel = [group_col] if group_col else []
    if mode == "linear":
        src = src.select(*sel, x)  # pin __x so the div expression sees it
    keys = sel + ["bucket"]
    agg = (
        src.select(*sel, bucket.alias("bucket"))
        .groupBy(*keys)
        .agg(F.count("*").alias("n_values"))
    )
    out = agg.withColumn("bucket_lo", b_lo)
    out = out.withColumn("bucket_hi", b_hi)
    cols = keys + ["bucket_lo", "bucket_hi", "n_values"]
    return out.select(*cols).orderBy(*keys)
