"""Deterministic weighted sampling without replacement.

Efraimidis & Spirakis 2006 (A-ES): give each row the key
e_i = -ln(u_i) / w_i with u_i uniform on (0, 1]; the k smallest keys are
a weighted sample without replacement (each subset's probability matches
sequential draws proportional to weight).  The training-data use case:
pick k documents per shard/source with probability proportional to a
quality or length weight, reproducibly.

u_i is NOT random state: it derives from the KMV permutation hash of the
row id (u = (h+1) / 2^31, h uniform on [0, 2^31) — sketches/kmv.py), so
the sample is a pure function of the data.  That buys three properties a
`rand()`-based sample cannot give:
  * re-runs, retries, and re-partitioning select the SAME rows;
  * the selection is exactly recomputable in ANSI SQL (the driver's
    oracle re-derives the full sample, not just its size);
  * adding rows never changes the relative order of existing keys, so
    samples are stable under corpus growth the way stable_split is.
Vary `salt` to draw an independent sample.

Plan: the key is pure Catalyst arithmetic; selection is a per-group
bottom-k window.  At extreme per-group row counts the window sort is the
cost — the same bounded partial-reduction used by kmv_sketch_per_group
applies if that ever dominates (keys are order-isomorphic to their IEEE
bit patterns), but scan + window is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import InputError
from ..sketches.kmv import P, hash_sql


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    salt: int = 0,
) -> DataFrame:
    """k-row weighted sample without replacement (per group when
    `group_col` is given): rows with weight w are selected proportionally
    to w.  Returns the input columns plus `sample_rank` (1..k by
    ascending key).  Rows with NULL or non-positive weight are excluded
    (they have zero selection probability).  `id_col` must be integral
    AND unique — it feeds the deterministic hash, so rows sharing an id
    get identical keys and the tie between them is partition-order
    dependent, voiding the determinism guarantee for exactly those
    rows."""
    for c in [id_col, weight_col] + ([group_col] if group_col else []):
        if c not in df.columns:
            raise InputError(f"weighted_sample: input lacks column {c!r}")
    if k < 1:
        raise InputError("weighted_sample needs k >= 1")
    if df.schema[id_col].dataType.typeName() not in (
        "integer",
        "long",
        "short",
        "byte",
    ):
        raise InputError("weighted_sample: id_col must be an integer column")
    h = F.expr(hash_sql(f"(CAST({id_col} AS BIGINT) + {int(salt)})"))
    u = (h + F.lit(1)) / F.lit(float(P + 1))  # uniform on (0, 1]
    key = -F.log(u) / F.col(weight_col).cast("double")
    src = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_es_key", key)
    parts = [group_col] if group_col else [F.lit(1)]
    w = Window.partitionBy(*parts).orderBy(F.col("_es_key").asc(), F.col(id_col).asc())
    return (
        src.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("_es_key")
    )
