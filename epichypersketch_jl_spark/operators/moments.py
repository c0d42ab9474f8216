"""Frequency-moment estimation: the AMS F2 sketch (Alon-Matias-Szegedy).

F2 = sum_v count(v)^2 — the second frequency moment — is the self-join
size of the column and the planner statistic behind join-size estimation
and repeat-rate / skew diagnostics at 100 TB: F2/n^2 near 1/n_distinct
means a flat column; F2 approaching n^2 means one value dominates and the
downstream shuffle needs salting (plans/partitioning.salt_hot_keys).

The AMS estimator: for d independent +/-1 sign hashes s_r, the linear
sketch S_r = sum_rows s_r(value) has E[S_r^2] = F2.  Crucially S_r sums
over OCCURRENCES, not distinct values (sum_v s_r(v)*c_v == sum_rows
s_r(v_row)), so the plan is a single aggregate with map-side partial
sums — NO shuffle of values, no groupBy, d longs per task crossing the
wire.  A 100-TB column's F2 costs one scan.

Exactness discipline (the package's KMV trick extended to a linear
sketch): the sign hash is parity of the quadratic-permutation hash
(sketches/kmv.py) of value + r * 1_000_003 — pure int64 Catalyst
arithmetic that runs verbatim in the DuckDB oracle, so the sketch SUMS
and the integer estimate (lower median of S_r^2) are exactly
SQL-recomputable: a full value-hash oracle for an approximate moment
estimate.

Reference parity note: the reference (EpicHyperSketch.jl) has no moment
sketches; this extends the mergeable-sketch family the north_star asks
for (the S_r vector is trivially mergeable: componentwise sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import InputError
from ..sketches.kmv import hash_sql

#: Salt stride between sign-hash rows (any odd constant; matches the
#: independent-sample salting used in operators/sampling tests).
SALT_STRIDE = 1_000_003

#: |S_r| bound under which S_r^2 (or a conservative S_A*S_B) fits int64:
#: floor(sqrt(2^63 - 1)).  Beyond it, squaring wraps silently under
#: non-ANSI Spark, so the estimate is emitted as NULL instead (ADVICE r4).
SQUARE_SAFE_ABS = 3_037_000_499


def sign_sql(value_expr: str, row: int) -> str:
    """SQL text for the r-th +/-1 sign hash of an integer expression —
    identical in Spark SQL and DuckDB: 1 - 2 * (hash(v + r*stride) % 2)."""
    h = hash_sql(f"(CAST({value_expr} AS BIGINT) + {row * SALT_STRIDE})")
    return f"(1 - 2 * (({h}) % 2))"


def ams_f2(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str | None = None,
    d: int = 8,
) -> DataFrame:
    """AMS second-frequency-moment estimate of ``value_col`` (int scalar
    or array<int>), overall or per group.

    Returns (group_col?, n_values: long, s_0..s_{d-1}: long, f2_est:
    long) where s_r are the d sign-hash sums (the mergeable sketch
    state, exposed so the oracle can hash-match them) and f2_est is the
    lower median of S_r^2 — never an overcount by more than the
    estimator's variance: E[S_r^2] = F2 exactly, median-of-d tames the
    tail.  NULL values (and NULL array elements) are ignored.

    S_r^2 fits int64 while |S_r| <= SQUARE_SAFE_ABS (~3e9, so ~3e9 rows
    per group worst-case); beyond that the estimate is emitted as NULL
    rather than a silently wrapped long — at that scale call with
    smaller groups or treat f2_est as the ratio diagnostic it is.
    """
    if d < 1:
        raise InputError(f"ams_f2 needs d >= 1, got {d}")
    if value_col not in df.columns:
        raise InputError(f"ams_f2: input lacks column {value_col!r}")
    if group_col is not None and group_col not in df.columns:
        raise InputError(f"ams_f2: input lacks column {group_col!r}")
    is_list = df.schema[value_col].dataType.typeName() == "array"
    v = F.explode(value_col) if is_list else F.col(value_col)
    cols = ([group_col] if group_col else []) + [v.alias("__v")]
    src = df.select(*cols).where(F.col("__v").isNotNull())
    sums = [
        F.coalesce(F.sum(F.expr(sign_sql("__v", r))), F.lit(0))
        .cast("long")
        .alias(f"s_{r}")
        for r in range(d)
    ]
    aggs = [F.count("*").alias("n_values")] + sums
    if group_col is not None:
        agg = src.groupBy(group_col).agg(*aggs)
    else:
        agg = src.agg(*aggs)
    sq = F.array_sort(
        F.array(*[F.col(f"s_{r}") * F.col(f"s_{r}") for r in range(d)])
    )
    # lower median keeps the estimate integer (SQL-exact); for d=1 this
    # is the single estimate itself
    est = F.element_at(sq, (d + 1) // 2)
    # never let a wrapped square masquerade as an estimate: if ANY sign
    # sum exceeds the int64-square-safe bound, the row's estimate is NULL
    unsafe = F.greatest(
        *[F.abs(F.col(f"s_{r}")) for r in range(d)], F.lit(0).cast("long")
    ) > F.lit(SQUARE_SAFE_ABS)
    return agg.withColumn(
        "f2_est", F.when(unsafe, F.lit(None)).otherwise(est).cast("long")
    )


def ams_join_size(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    *,
    d: int = 8,
) -> DataFrame:
    """Equi-join CARDINALITY estimate without executing the join — the
    original AMS application (Alon-Gibbons-Matias-Szegedy 1999): for the
    same d sign hashes, E[S_A_r * S_B_r] = sum_v cA(v)*cB(v) = |A join B|.
    Each side costs one scan-and-aggregate (d partial sums per task, no
    shuffle of values); the estimate is the lower median of the d
    products.  The planner statistic for "should this join be broadcast,
    salted, or avoided" at 100 TB — priced at two column scans.

    Unlike F2 (a sum of squares), cross products can be negative; the
    estimator is unbiased but individual products may undershoot zero —
    emitted as-is (clamp at the call site if a lower bound of 0 is
    wanted).  Same SQL-exactness as ams_f2: sign sums and the median
    product are pure integer/Catalyst arithmetic.

    Returns one row: (n_a, n_b, sa_0..sa_{d-1}, sb_0..sb_{d-1},
    join_size_est)."""
    if d < 1:
        raise InputError(f"ams_join_size needs d >= 1, got {d}")
    for df, c, side in ((df_a, col_a, "left"), (df_b, col_b, "right")):
        if c not in df.columns:
            raise InputError(f"ams_join_size: {side} input lacks column {c!r}")

    def side_sums(df: DataFrame, col: str, prefix: str) -> DataFrame:
        is_list = df.schema[col].dataType.typeName() == "array"
        v = F.explode(col) if is_list else F.col(col)
        src = df.select(v.alias("__v")).where(F.col("__v").isNotNull())
        aggs = [F.count("*").alias(f"n_{prefix}")] + [
            F.coalesce(F.sum(F.expr(sign_sql("__v", r))), F.lit(0))
            .cast("long")
            .alias(f"s{prefix}_{r}")
            for r in range(d)
        ]
        return src.agg(*aggs)

    a = side_sums(df_a, col_a, "a")
    b = side_sums(df_b, col_b, "b")
    joined = a.crossJoin(b)  # two single-row frames
    prods = F.array_sort(
        F.array(*[F.col(f"sa_{r}") * F.col(f"sb_{r}") for r in range(d)])
    )
    est = F.element_at(prods, (d + 1) // 2)
    # conservative int64-overflow guard (see ams_f2): NULL estimate when
    # any sign sum on either side exceeds the square-safe bound
    unsafe = F.greatest(
        *[F.abs(F.col(f"sa_{r}")) for r in range(d)],
        *[F.abs(F.col(f"sb_{r}")) for r in range(d)],
    ) > F.lit(SQUARE_SAFE_ABS)
    return joined.withColumn(
        "join_size_est", F.when(unsafe, F.lit(None)).otherwise(est).cast("long")
    )
