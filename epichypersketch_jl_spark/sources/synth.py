"""Deterministic planted-ground-truth corpora — ports of the reference's
test generators (test/test_large_example_ordinary.jl:23-113,
test/test_large_example_convolution.jl:43-135, test/test_cpu_implementation.jl:5-131).

Design invariants (FIXTURES.md):
  * seed fixed (42) -> byte-identical corpora on every run/machine;
  * token ids >= 1 (reference reserves 0 for padding, src/record.jl:159);
  * tokens distinct within a doc, noise ranges disjoint from motif tokens,
    so the per-occurrence counting unit and the unique-subset oracle agree
    (SURVEY.md §2 "Counting-unit semantics");
  * a deliberately hot `source` for skew tests.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Ground truth of Fixture A/B: motif -> planted count
PLANTED_ORDINARY = {(7, 19, 42): 25, (13, 28, 55): 15, (8, 22, 39): 12, (3, 41, 67): 8}
# Convolution: motif (position-ordered) -> (positions, count); filter_len = 8
PLANTED_CONV = {
    (7, 19, 42): ((10, 20, 32), 25),
    (13, 28, 55): ((5, 18, 29), 15),
    (22, 8, 39): ((8, 20, 35), 12),
    (3, 41, 67): ((15, 25, 40), 8),
}
CONV_FILTER_LEN = 8


def _sources(rng: np.ndarray, n: int) -> list[str]:
    # ~70% of rows land in the hot source (skew axis, FIXTURES.md Fixture D)
    pick = np.asarray(rng)
    return ["src_hot" if p < 0.7 else f"src_{chr(97 + int(p * 100) % 3)}" for p in pick]


def planted_motif_corpus(n_docs: int = 750, seed: int = 42) -> pd.DataFrame:
    """Fixture A: ordinary planted-motif corpus."""
    rng = np.random.default_rng(seed)
    rows = []
    plant_blocks = [
        (range(0, 25), [7, 19, 42], (100, 151)),
        (range(25, 40), [13, 28, 55], (200, 251)),
        (range(40, 48), [3, 41, 67], (300, 351)),
        (range(48, 60), [8, 22, 39], (400, 451)),
    ]
    planted_ids = set()
    for ids, motif, (lo, hi) in plant_blocks:
        for i in ids:
            planted_ids.add(i)
            n_noise = int(rng.integers(2, 6))
            noise = rng.choice(np.arange(lo, hi), size=n_noise, replace=False)
            toks = np.concatenate([np.array(motif), noise])
            rng.shuffle(toks)
            rows.append((i, toks.astype(np.int32)))
    for i in range(60, 600):
        n = int(rng.integers(3, 9))
        toks = rng.choice(np.arange(500, 601), size=n, replace=False).astype(np.int32)
        rows.append((i, toks))
    all_motif_tokens = [7, 19, 42, 13, 28, 55, 3, 41, 67, 8, 22, 39]
    for i in range(600, 700):
        n_members = int(rng.integers(1, 3))
        members = rng.choice(all_motif_tokens, size=n_members, replace=False)
        n_noise = int(rng.integers(2, 5))
        noise = rng.choice(np.arange(700, 801), size=n_noise, replace=False)
        rows.append((i, np.concatenate([members, noise]).astype(np.int32)))
    for i in range(700, 710):
        rows.append((i, np.array([], dtype=np.int32)))  # empty: dropped by n_tok filter
    for i in range(710, min(n_docs, 750)):
        n = int(rng.integers(1, 3))
        toks = rng.choice(np.arange(900, 1001), size=n, replace=False).astype(np.int32)
        rows.append((i, toks))
    src = _sources(rng.random(len(rows)), len(rows))
    return pd.DataFrame(
        {
            "doc_id": [f"doc_{i:06d}" for i, _ in rows],
            "tokens": [t.tolist() for _, t in rows],
            "n_tok": np.array([len(t) for _, t in rows], dtype=np.int32),
            "source": src,
        }
    )


def planted_conv_corpus(seed: int = 42) -> pd.DataFrame:
    """Fixture B: convolution corpus with fixed positions (known gaps)."""
    rng = np.random.default_rng(seed)
    rows = []
    blocks = [
        (range(0, 25), (7, 19, 42), (10, 20, 32), (100, 151)),
        (range(25, 40), (13, 28, 55), (5, 18, 29), (200, 251)),
        (range(40, 48), (3, 41, 67), (15, 25, 40), (300, 351)),
        (range(48, 60), (22, 8, 39), (8, 20, 35), (400, 451)),
    ]
    for ids, motif, pos, (lo, hi) in blocks:
        for i in ids:
            n_noise = int(rng.integers(1, 4))
            noise_t = rng.choice(np.arange(lo, hi), size=n_noise, replace=False)
            noise_p = 60 + np.arange(n_noise) * 15  # far past the motif span
            toks = np.concatenate([np.array(motif), noise_t]).astype(np.int32)
            poss = np.concatenate([np.array(pos), noise_p]).astype(np.int32)
            perm = rng.permutation(len(toks))  # scramble storage order
            rows.append((i, toks[perm], poss[perm]))
    for i in range(60, 600):
        n = int(rng.integers(3, 9))
        toks = rng.choice(np.arange(500, 601), size=n, replace=False).astype(np.int32)
        poss = (1 + np.sort(rng.choice(np.arange(1, 200, 10), size=n, replace=False))).astype(
            np.int32
        )
        rows.append((i, toks, poss))
    src = _sources(rng.random(len(rows)), len(rows))
    return pd.DataFrame(
        {
            "doc_id": [f"doc_{i:06d}" for i, *_ in rows],
            "tokens": [t.tolist() for _, t, _ in rows],
            "positions": [p.tolist() for *_, p in rows],
            "n_tok": np.array([len(t) for _, t, _ in rows], dtype=np.int32),
            "source": src,
        }
    )


SEQ_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

SEQ_POS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("positions", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)


def corpus_to_df(spark: SparkSession, pdf: pd.DataFrame, n_partitions: int | None = None) -> DataFrame:
    schema = SEQ_POS_SCHEMA if "positions" in pdf.columns else SEQ_SCHEMA
    cols = [f.name for f in schema.fields]
    df = spark.createDataFrame(pdf[cols], schema=schema)
    return df.repartition(n_partitions) if n_partitions else df


def exact_motif_counts(pdf: pd.DataFrame, k: int) -> dict[tuple, int]:
    """Brute-force per-occurrence oracle (test-side only), mirroring the
    reference's verify_ground_truth (test/test_large_example_ordinary.jl:118-169)."""
    counts: dict[tuple, int] = {}
    for toks in pdf["tokens"]:
        for c in combinations(sorted(toks), k):
            counts[c] = counts.get(c, 0) + 1
    return counts


def exact_conv_counts(pdf: pd.DataFrame, k: int, filter_len: int) -> dict[tuple, int]:
    """Oracle for convolution keys (filters..., gaps...), CPU gap semantics."""
    counts: dict[tuple, int] = {}
    for toks, poss in zip(pdf["tokens"], pdf["positions"]):
        order = np.argsort(poss, kind="stable")
        t = np.asarray(toks)[order]
        p = np.asarray(poss)[order]
        for idx in combinations(range(len(t)), k):
            gaps = [int(p[idx[j + 1]] - p[idx[j]] - filter_len) for j in range(k - 1)]
            if any(g < 0 for g in gaps):
                continue
            key = tuple(int(t[i]) for i in idx) + tuple(gaps)
            counts[key] = counts.get(key, 0) + 1
    return counts
