"""Checkpoint/resume tests (north_rule: resumable from per-partition sketch
checkpoints with lineage + metrics)."""

import shutil

import pytest

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.operators.motif import build_motif_cms
from epichypersketch_jl_spark.sources.synth import corpus_to_df, planted_motif_corpus


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestCheckpointResume:
    def test_checkpointed_equals_direct(self, spark, ckpt_dir):
        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf, n_partitions=6)
        cfg = HyperSketchConfig(motif_size=3, min_count=8, seed=42)
        direct, _ = build_motif_cms(df, cfg)
        ck, metrics = build_motif_cms(df, cfg, checkpoint_dir=ckpt_dir, n_buckets=8)
        assert ck == direct, "bucketed+checkpointed merge must equal the direct merge"
        assert ck.n_updates == direct.n_updates
        assert len(metrics) == 8  # one lineage row per bucket

    def test_resume_after_partial_run(self, spark, ckpt_dir):
        """Simulate a crash: first run covers only half the buckets (via a
        filtered input), the resume run gets the full input and must (a) skip
        completed buckets and (b) produce the exact single-shot sketch."""
        from pyspark.sql import functions as F

        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf, n_partitions=6)
        cfg = HyperSketchConfig(motif_size=3, min_count=8, seed=42)
        n_buckets = 8

        bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")
        half = df.filter(bucket < 4)
        # "crashed" run: only half the data reached the checkpoint
        build_motif_cms(half, cfg, checkpoint_dir=ckpt_dir, n_buckets=n_buckets)
        done_before = spark.read.parquet(ckpt_dir).select("part_id").distinct().count()
        assert done_before == 4

        # resume with the full input
        resumed, metrics = build_motif_cms(
            df, cfg, checkpoint_dir=ckpt_dir, n_buckets=n_buckets
        )
        direct, _ = build_motif_cms(df, cfg)
        assert resumed == direct
        # completed buckets were not rebuilt: still exactly one blob per bucket
        blobs = spark.read.parquet(ckpt_dir)
        assert blobs.count() == n_buckets
        assert {r.part_id for r in blobs.select("part_id").distinct().collect()} == set(
            range(n_buckets)
        )

    def test_rerun_is_idempotent(self, spark, ckpt_dir):
        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf, n_partitions=4)
        cfg = HyperSketchConfig(motif_size=2, min_count=8, seed=42)
        a, _ = build_motif_cms(df, cfg, checkpoint_dir=ckpt_dir, n_buckets=4)
        b, _ = build_motif_cms(df, cfg, checkpoint_dir=ckpt_dir, n_buckets=4)
        assert a == b
