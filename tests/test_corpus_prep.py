"""Context-window chunking and deterministic split (operators/corpus_prep).

Chunk-layout invariants (window math, overlap stitching, lossless coverage)
plus the property stable_split exists for: assignment is a pure function of
(id, seed) — invariant under partitioning and corpus growth.
"""

import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.errors import InputError
from epichypersketch_jl_spark.operators.corpus_prep import (
    chunk_documents,
    stable_split,
)


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        df = _mkdocs(spark, ["a b c"])
        rows = chunk_documents(df, max_words=5, overlap=1).collect()
        assert len(rows) == 1
        assert rows[0].chunk_text == "a b c" and rows[0].n_words == 3

    def test_exact_boundary_single_chunk(self, spark):
        text = " ".join(f"w{i}" for i in range(5))
        rows = chunk_documents(_mkdocs(spark, [text]), max_words=5, overlap=2).collect()
        assert len(rows) == 1 and rows[0].n_words == 5

    def test_window_layout_and_overlap(self, spark):
        words = [f"w{i}" for i in range(11)]
        rows = (
            chunk_documents(_mkdocs(spark, [" ".join(words)]), max_words=5, overlap=2)
            .orderBy("chunk_id")
            .collect()
        )
        # stride 3: starts 0,3,6 -> windows [0:5],[3:8],[6:11]; 11 <= 6+5 so 3 chunks
        assert [r.chunk_id for r in rows] == [0, 1, 2]
        assert rows[0].chunk_text.split(" ") == words[0:5]
        assert rows[1].chunk_text.split(" ") == words[3:8]
        assert rows[2].chunk_text.split(" ") == words[6:11]
        # consecutive chunks share exactly `overlap` words
        assert rows[0].chunk_text.split(" ")[-2:] == rows[1].chunk_text.split(" ")[:2]

    def test_lossless_coverage(self, spark):
        """Dropping each chunk's first `overlap` words (except chunk 0) and
        concatenating reconstructs the document exactly."""
        words = [f"t{i}" for i in range(137)]
        rows = (
            chunk_documents(_mkdocs(spark, [" ".join(words)]), max_words=16, overlap=4)
            .orderBy("chunk_id")
            .collect()
        )
        rebuilt = []
        for r in rows:
            ws = r.chunk_text.split(" ")
            rebuilt.extend(ws if r.chunk_id == 0 else ws[4:])
        assert rebuilt == words

    def test_last_chunk_never_empty(self, spark):
        # n divisible by stride: no trailing chunk past the end
        words = [f"x{i}" for i in range(12)]  # max 6, overlap 2 -> stride 4
        rows = (
            chunk_documents(_mkdocs(spark, [" ".join(words)]), max_words=6, overlap=2)
            .orderBy("chunk_id")
            .collect()
        )
        assert all(r.n_words > 0 for r in rows)
        assert rows[-1].chunk_text.split(" ")[-1] == "x11"

    def test_param_validation(self, spark):
        df = _mkdocs(spark, ["a"])
        with pytest.raises(InputError):
            chunk_documents(df, max_words=0)
        with pytest.raises(InputError):
            chunk_documents(df, max_words=4, overlap=4)
        with pytest.raises(InputError):
            chunk_documents(df, max_words=4, overlap=-1)


class TestStableSplit:
    def test_partition_invariance_and_coverage(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = stable_split(df).select("doc_id", "split")
        b = stable_split(df.repartition(13)).select(
            "doc_id", F.col("split").alias("split_b")
        )
        moved = a.join(b, "doc_id").filter(F.col("split") != F.col("split_b")).count()
        assert moved == 0
        assert a.filter(F.col("split").isNull()).count() == 0

    def test_growth_stability(self, spark):
        """Growing the corpus never reassigns an existing id — the property
        random/ordinal splitting cannot provide."""
        small = stable_split(spark.range(500).withColumnRenamed("id", "doc_id"))
        big = stable_split(spark.range(5000).withColumnRenamed("id", "doc_id"))
        j = small.select("doc_id", "split").join(
            big.select("doc_id", F.col("split").alias("split_big")), "doc_id"
        )
        assert j.filter(F.col("split") != F.col("split_big")).count() == 0

    def test_fraction_concentration(self, spark):
        df = spark.range(20000).withColumnRenamed("id", "doc_id")
        counts = dict(
            stable_split(df, fractions={"train": 0.9, "test": 0.1})
            .groupBy("split")
            .count()
            .collect()
        )
        assert abs(counts["train"] / 20000 - 0.9) < 0.02
        assert abs(counts["test"] / 20000 - 0.1) < 0.02

    def test_seed_changes_assignment(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        a = stable_split(df, seed=1).select("doc_id", "split")
        b = stable_split(df, seed=2).select("doc_id", F.col("split").alias("s2"))
        assert a.join(b, "doc_id").filter(F.col("split") != F.col("s2")).count() > 0

    def test_validation(self, spark):
        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with pytest.raises(InputError):
            stable_split(df, fractions={"a": 0.5, "b": 0.6})
        with pytest.raises(InputError):
            stable_split(df, fractions={})
