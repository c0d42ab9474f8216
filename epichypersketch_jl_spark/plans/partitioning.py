"""Partitioning & skew strategies (reference: partition.jl — length
partitioning as a memory-staging device; north_rule: explicit salting /
repartition for source-key skew).

In the Spark design these are *data-layout* choices feeding the map-only
build: because the sketch merge is associative and the kernels group rows by
length internally, ANY partitioning yields the identical merged sketch (the
partition-invariance property tests prove it); partitioning only shapes task
balance and peak memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_by_length(
    df: DataFrame, n_partitions: int, length_col: str = "n_tok"
) -> DataFrame:
    """Range-partition by sequence length — the reference's
    partition_by_length (src/partition.jl:54-97) as one Catalyst call.
    Groups same-length rows so the kernel's length-group gathers are large
    and its combs matrices cache-hot; also evens out the C(L,k) work curve
    because each task sees a narrow length band."""
    return df.repartitionByRange(n_partitions, F.col(length_col))


def salt_hot_keys(
    df: DataFrame,
    key_col: str,
    *,
    n_salts: int = 8,
    hot_threshold: float = 0.2,
) -> DataFrame:
    """Explicit skew defusal: keys holding more than `hot_threshold` of all
    rows get an added salt column spreading them over `n_salts` shuffle
    buckets.  Use before groupBy/repartition on a skewed key (e.g. one hot
    `source`).  Returns df + `__salted_key` column to shuffle on.

    The hot-key set is found with one small aggregate and broadcast back —
    no sort, no sampling job.  The salt is a deterministic hash of the row's
    content (all columns): nondeterministic salts (random ids) change a
    row's shuffle key on stage retry, which can double-count or drop rows
    under fetch-failure recompute.
    """
    total = df.count()
    hot = [
        r[key_col]
        for r in df.groupBy(key_col)
        .count()
        .filter(F.col("count") > hot_threshold * total)
        .collect()
    ]
    if not hot:
        return df.withColumn("__salted_key", F.col(key_col).cast("string"))
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return df.withColumn(
        "__salted_key",
        F.when(
            F.col(key_col).isin(hot),
            F.concat_ws("#", F.col(key_col).cast("string"), salt.cast("string")),
        ).otherwise(F.col(key_col).cast("string")),
    )


def plan_report(df: DataFrame) -> dict:
    """Parse the formatted physical plan into the signals that matter at
    scale: exchanges (shuffles), scans + pushed filters, whole-stage codegen
    coverage, Python/Arrow evals.  Used by tests to pin plan shape."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    lines = plan.splitlines()
    return {
        "n_exchanges": sum("Exchange" in ln for ln in lines if "Reused" not in ln),
        "n_scans": sum("Scan parquet" in ln or "Scan Existing" in ln for ln in lines),
        "pushed_filters": [ln.strip() for ln in lines if "PushedFilters" in ln],
        "n_codegen_stages": sum("WholeStageCodegen" in ln for ln in lines),
        "n_python_evals": sum(
            ("ArrowEvalPython" in ln) or ("MapInArrow" in ln) or ("FlatMapGroupsInArrow" in ln)
            for ln in lines
        ),
        "plan": plan,
    }
