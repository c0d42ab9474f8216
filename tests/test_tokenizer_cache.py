"""Tokenizer ingest layer: write-once cache, distributed vocab ranking,
join-path equivalence, and unknown-word validation."""

import os

import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.errors import InputError
from epichypersketch_jl_spark.sources.tables import (
    build_vocab,
    documents_sequences,
    read_table,
    tokenize_with_vocab_join,
    tokenized_cache_path,
    tokenized_sequences,
    vocab_table,
)


def _canon(df):
    return [
        (r.doc_id, list(r.tokens), r.n_tok, r.source)
        for r in df.orderBy("doc_id").collect()
    ]


class TestVocabTable:
    def test_matches_driver_ranking(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        expected = build_vocab(docs)
        vdf = vocab_table(docs)
        got = {r.w: r.tok for r in vdf.collect()}
        vdf.unpersist_source()
        assert len(got) == len(expected)
        for rank, w in enumerate(expected, start=1):
            assert got[w] == rank

    def test_partition_invariance(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        a = vocab_table(docs.repartition(2))
        b = vocab_table(docs.repartition(7))
        ra = sorted((r.w, r.tok) for r in a.collect())
        rb = sorted((r.w, r.tok) for r in b.collect())
        a.unpersist_source()
        b.unpersist_source()
        assert ra == rb


class TestJoinTokenizer:
    def test_equals_broadcast_path(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
        vdf = vocab_table(docs)
        joined = tokenize_with_vocab_join(docs, vdf, with_positions=True)
        broadcast = documents_sequences(spark, sf_dir, with_positions=True)
        ja = [
            (r.doc_id, list(r.tokens), r.n_tok, list(r.positions), r.source)
            for r in joined.orderBy("doc_id").collect()
        ]
        ba = [
            (r.doc_id, list(r.tokens), r.n_tok, list(r.positions), r.source)
            for r in broadcast.orderBy("doc_id").collect()
        ]
        vdf.unpersist_source()
        assert ja == ba

    def test_unknown_word_raises_in_join_path(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b mystery", "s")], "doc_id: long, text: string, source: string"
        )
        vocab = spark.createDataFrame([("a", 1), ("b", 2)], "w: string, tok: int")
        with pytest.raises(Exception) as ei:
            tokenize_with_vocab_join(docs, vocab).collect()
        assert "vocabulary" in str(ei.value)

    def test_unknown_word_zero_in_join_path(self, spark):
        docs = spark.createDataFrame(
            [(1, "a mystery b", "s")], "doc_id: long, text: string, source: string"
        )
        vocab = spark.createDataFrame([("a", 1), ("b", 2)], "w: string, tok: int")
        out = tokenize_with_vocab_join(docs, vocab, unknown="zero").collect()
        assert list(out[0].tokens) == [1, 0, 2]

    def test_empty_doc_kept(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a", "s"), (2, "   ", "s"), (3, "", "s")],
            "doc_id: long, text: string, source: string",
        )
        vdf = vocab_table(docs)
        out = {r.doc_id: (list(r.tokens), r.n_tok) for r in
               tokenize_with_vocab_join(docs, vdf).collect()}
        vdf.unpersist_source()
        assert out[1] == ([1, 2, 1], 3)
        assert out[2] == ([], 0)
        assert out[3] == ([], 0)


class TestUnknownWords:
    def test_unknown_raises(self, spark, sf_dir):
        with pytest.raises(Exception) as ei:
            documents_sequences(spark, sf_dir, vocab=["aardvark", "zebra"]).collect()
        assert "vocabulary" in str(ei.value)

    def test_unknown_zero_maps_to_padding(self, spark):
        import pandas as pd

        # build a one-doc corpus on the fly via a temp dir-less path is not
        # possible through documents_sequences (it reads sf_dir), so verify
        # through the kernel contract: known words rank, unknowns -> 0
        df = spark.createDataFrame(
            [(0, "b x a", "s")], "doc_id: long, text: string, source: string"
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
            out = documents_sequences(
                spark, d, vocab=["a", "b"], unknown="zero"
            ).collect()
        assert list(out[0].tokens) == [2, 0, 1]


class TestCache:
    def test_write_once_then_hit(self, spark, sf_dir, tmp_path, monkeypatch):
        monkeypatch.setenv("EHS_TOKEN_CACHE", str(tmp_path))
        a = _canon(tokenized_sequences(spark, sf_dir))
        path = tokenized_cache_path(sf_dir)
        assert os.path.exists(os.path.join(path, "sequences", "_SUCCESS"))
        assert os.path.exists(os.path.join(path, "vocab", "_SUCCESS"))
        mtime = os.path.getmtime(os.path.join(path, "sequences", "_SUCCESS"))
        b = _canon(tokenized_sequences(spark, sf_dir))
        assert a == b
        assert os.path.getmtime(os.path.join(path, "sequences", "_SUCCESS")) == mtime

    def test_cache_equals_direct(self, spark, sf_dir, tmp_path, monkeypatch):
        monkeypatch.setenv("EHS_TOKEN_CACHE", str(tmp_path))
        cached = tokenized_sequences(spark, sf_dir, with_positions=True)
        direct = documents_sequences(spark, sf_dir, with_positions=True)
        ca = [
            (r.doc_id, list(r.tokens), r.n_tok, list(r.positions), r.source)
            for r in cached.orderBy("doc_id").collect()
        ]
        da = [
            (r.doc_id, list(r.tokens), r.n_tok, list(r.positions), r.source)
            for r in direct.orderBy("doc_id").collect()
        ]
        assert ca == da

    def test_join_strategy_cache(self, spark, sf_dir, tmp_path, monkeypatch):
        monkeypatch.setenv("EHS_TOKEN_CACHE", str(tmp_path))
        a = _canon(tokenized_sequences(spark, sf_dir, strategy="join"))
        b = _canon(documents_sequences(spark, sf_dir))
        assert a == b


class TestCatalogDispatch:
    def test_parquet_path(self, spark, sf_dir):
        assert read_table(spark, sf_dir, "documents").count() > 0

    def test_catalog_identifier(self, spark, monkeypatch):
        calls = {}

        class FakeReader:
            def table(self, ident):
                calls["ident"] = ident
                return "TABLE_DF"

            def parquet(self, path):
                raise AssertionError("should have dispatched to catalog")

        monkeypatch.setattr(
            type(spark), "read", property(lambda self: FakeReader())
        )
        out = read_table(spark, "my_catalog.db", "events")
        assert out == "TABLE_DF"
        assert calls["ident"] == "my_catalog.db.events"


class TestTokenizerAdversarial:
    CASES = [
        (1, "héllo wörld héllo", "s"),
        (2, "  leading and   multiple  spaces ", "s"),
        (3, "single", "s"),
        (4, "", "s"),
        (5, "tab\tis one word", "s"),  # split on space only
        (6, "ZZZ aaa ZZZ aaa", "s"),
        (7, "ümlaut Ümlaut ümlaut", "s"),  # case-distinct unicode
        (8, "a " * 200 + "b", "s"),  # long repetitive doc
    ]

    def test_broadcast_equals_join_on_edge_cases(self, spark):
        docs = spark.createDataFrame(
            self.CASES, "doc_id: long, text: string, source: string"
        )
        vdf = vocab_table(docs)
        joined = {
            r.doc_id: (list(r.tokens), r.n_tok, list(r.positions))
            for r in tokenize_with_vocab_join(docs, vdf, with_positions=True).collect()
        }
        vocab = [r.w for r in vdf.orderBy("tok").collect()]
        vdf.unpersist_source()
        # broadcast kernel over the same corpus written to a temp sf_dir
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            docs.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
            direct = {
                r.doc_id: (list(r.tokens), r.n_tok, list(r.positions))
                for r in documents_sequences(
                    spark, d, with_positions=True, vocab=vocab
                ).collect()
            }
        assert joined == direct
        # spot-check semantics: doc 2 has exactly 4 words, positions dense
        assert direct[2][1] == 4 and direct[2][2] == [1, 2, 3, 4]
        assert direct[4] == ([], 0, [])
        assert direct[5][1] == 3  # "tab\tis", "one", "word"
