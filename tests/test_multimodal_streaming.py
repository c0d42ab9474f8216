"""Multimodal binary-column plumbing + structured-streaming sketch tests."""

import shutil

import numpy as np
import pytest

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.sources.multimodal import (
    attach_binary_payload,
    decode_features,
    decode_image,
    sample_frames,
)
from epichypersketch_jl_spark.sources.synth import corpus_to_df, planted_motif_corpus
from epichypersketch_jl_spark.sources.tables import read_table
from epichypersketch_jl_spark.streaming.sketch_stream import StreamingSketchJob


class TestMultimodal:
    def test_payload_and_features(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents").limit(50)
        with_bin = attach_binary_payload(docs)
        assert dict(with_bin.dtypes)["payload"] == "binary"
        feats = decode_features(with_bin, dim=32).toPandas()
        assert len(feats) == 50
        dims = feats["features"].map(len)
        assert (dims == 32).all()
        # deterministic fake decode: rerun gives identical features
        again = decode_features(attach_binary_payload(docs), dim=32).toPandas()
        a = np.stack(feats.sort_values("doc_id")["features"].map(np.asarray))
        b = np.stack(again.sort_values("doc_id")["features"].map(np.asarray))
        assert np.array_equal(a, b)
        assert (feats["n_bytes"] > 0).all()

    def test_real_decode_probe(self):
        """Codec probe contract: raises NotImplementedError when Pillow is
        absent; decodes real image bytes when present (auto-selected)."""
        from epichypersketch_jl_spark.sources.multimodal import _pil_available

        if not _pil_available():
            with pytest.raises(NotImplementedError):
                decode_image()
            return
        from io import BytesIO

        from PIL import Image

        buf = BytesIO()
        Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="PNG")
        feats = decode_image([buf.getvalue()], 16, 0)
        assert feats.shape == (1, 16)
        assert np.isfinite(feats).all() and (np.abs(feats) <= 1.0).all()

    def test_real_decode_through_spark(self, spark):
        """fake=False end-to-end: auto-skips without a codec, exercises the
        identical mapInArrow plumbing with one when installed."""
        from epichypersketch_jl_spark.sources.multimodal import _pil_available

        if not _pil_available():
            pytest.skip("Pillow not installed in this container")
        from io import BytesIO

        from PIL import Image

        def png(color):
            buf = BytesIO()
            Image.new("RGB", (4, 4), color).save(buf, format="PNG")
            return buf.getvalue()

        df = spark.createDataFrame(
            [(1, png((0, 0, 0))), (2, png((255, 255, 255)))],
            "doc_id long, payload binary",
        )
        out = decode_features(df, dim=8, fake=False).toPandas()
        assert len(out) == 2
        assert out["features"].map(len).eq(8).all()

    def test_frame_sampling(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents").limit(10)
        frames = sample_frames(
            attach_binary_payload(docs), frame_bytes=32, stride=2
        ).toPandas()
        assert (frames["frame_idx"] % 2 == 0).all()
        assert frames["frame"].map(len).max() <= 32
        assert frames["doc_id"].nunique() == 10


class TestStreaming:
    def test_streaming_sketch_matches_batch(self, spark, tmp_path):
        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf, n_partitions=4)
        src_dir = str(tmp_path / "src")
        blob_dir = str(tmp_path / "blobs")
        ckpt = str(tmp_path / "ckpt")
        # write the corpus as two parquet chunks = two stream files
        df.filter("doc_id < 'doc_000400'").write.parquet(src_dir + "/p1")
        df.filter("doc_id >= 'doc_000400'").write.parquet(src_dir + "/p2")
        shutil.move(src_dir + "/p1", src_dir + "_stage1")

        cfg = HyperSketchConfig(motif_size=3, min_count=8, seed=42)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src_dir + "_stage1")
        )
        job = StreamingSketchJob(cfg, blob_dir)
        q = job.start(stream, checkpoint_dir=ckpt, available_now=True)
        q.awaitTermination(120)

        # second tranche arrives; new availableNow run picks up only new files
        for f in __import__("pathlib").Path(src_dir + "/p2").iterdir():
            if f.suffix == ".parquet":
                shutil.copy(str(f), src_dir + "_stage1/" + f.name)
        stream2 = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src_dir + "_stage1")
        )
        q2 = job.start(stream2, checkpoint_dir=ckpt, available_now=True)
        q2.awaitTermination(120)

        streamed = job.current_sketch(spark)
        from epichypersketch_jl_spark.operators.motif import build_motif_cms

        batch, _ = build_motif_cms(df, cfg)
        assert streamed == batch, "incremental streaming sketch must equal batch build"
        assert streamed.n_updates == batch.n_updates


class TestStreamingAnySketch:
    def test_streaming_hll_and_kmv_equal_batch(self, spark, tmp_path, sf_dir):
        """The generic streaming job maintains non-CMS family sketches:
        incremental availableNow ingestion == one-shot batch build."""
        from epichypersketch_jl_spark.sketches.hll import HyperLogLog
        from epichypersketch_jl_spark.sketches.kmv import KMV, kmv_hash
        from epichypersketch_jl_spark.streaming.sketch_stream import (
            StreamingAnySketchJob,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
        src_dir = str(tmp_path / "src")
        ev.repartition(3).write.parquet(src_dir)

        def hll_update(sk, batch, stats):
            sk.update_batch(batch.column("user_id").to_numpy(zero_copy_only=False))

        def kmv_update(sk, batch, stats):
            sk.update_raw(
                batch.column("user_id").to_numpy(zero_copy_only=False)
            )

        for name, zero, update in [
            ("hll", lambda: HyperLogLog(p=12, seed=7), hll_update),
            ("kmv", lambda: KMV(k=64), kmv_update),
        ]:
            job = StreamingAnySketchJob(
                zero, update, str(tmp_path / f"{name}_blobs")
            )
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src_dir)
            )
            q = job.start(
                stream,
                checkpoint_dir=str(tmp_path / f"{name}_ckpt"),
                available_now=True,
            )
            q.awaitTermination(120)
            streamed = job.current_sketch(spark)
            batch_sk = zero()
            import numpy as np

            vals = np.array(
                [r.user_id for r in ev.collect()], dtype=np.int64
            )
            if name == "hll":
                batch_sk.update_batch(vals)
                assert np.array_equal(streamed.regs, batch_sk.regs)
                assert streamed.estimate() == batch_sk.estimate()
            else:
                batch_sk.update_raw(vals)
                assert streamed == batch_sk  # KMV defines value equality
