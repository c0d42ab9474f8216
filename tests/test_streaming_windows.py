"""Streaming windowed aggregation: watermark finalization, late-data drop,
and batch-parity of the window results."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.sources.tables import read_table
from epichypersketch_jl_spark.streaming.windows import (
    streaming_hll_per_window,
    windowed_event_counts,
)


@pytest.fixture()
def event_stream(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    # watermarks require TIMESTAMP (LTZ); the parquet carries TIMESTAMP_NTZ
    ev = read_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    return ev, stream


class TestStreamingWindows:
    def test_windowed_counts_match_batch(self, spark, event_stream, tmp_path):
        ev, stream = event_stream
        out = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("select * from win_counts").toPandas()
        exact = (
            ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "n_events",
            )
            .toPandas()
        )
        # append mode only finalizes windows older than the watermark: the
        # last open window is withheld.  Every emitted row must match batch.
        m = got.merge(exact, on=["window_start", "event_type"], suffixes=("", "_exact"))
        assert len(m) == len(got) > 0
        assert (m["n_events"] == m["n_events_exact"]).all()
        # windows whose end is still within the final watermark stay open:
        # at a 30-min watermark over 1-hour windows that's the last 1-2
        assert got["window_start"].nunique() >= exact["window_start"].nunique() - 2

    def test_streaming_hll_window(self, spark, event_stream, tmp_path):
        ev, stream = event_stream
        out = streaming_hll_per_window(stream, window="6 hours", watermark="1 minute")
        q = (
            out.writeStream.format("memory")
            .queryName("win_hll")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("select * from win_hll").toPandas()
        assert len(got) > 0
        exact = (
            ev.groupBy(F.window("ts", "6 hours").alias("win"))
            .agg(F.countDistinct("user_id").alias("n"))
            .select(F.col("win.start").alias("window_start"), "n")
            .toPandas()
        )
        m = got.merge(exact, on="window_start")
        rel = (m["approx_distinct"] - m["n"]).abs() / m["n"].clip(lower=1)
        assert (rel < 0.1).all()


class TestStreamingDedup:
    def test_doubled_stream_dedups_to_distinct(self, spark, event_stream, tmp_path):
        from epichypersketch_jl_spark.streaming.dedup import dedup_stream

        ev, stream = event_stream
        doubled = stream.unionByName(stream).select("event_id", "ts")
        out = dedup_stream(doubled, ["event_id"], watermark="2 hours")
        q = (
            out.writeStream.format("memory")
            .queryName("sdedup")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckd"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("select event_id from sdedup").toPandas()
        spark.catalog.dropTempView("sdedup")
        want = ev.select("event_id").toPandas()
        assert sorted(got["event_id"]) == sorted(want["event_id"])

    def test_guards(self, spark, event_stream):
        import pytest as _pytest

        from epichypersketch_jl_spark.errors import InputError
        from epichypersketch_jl_spark.streaming.dedup import dedup_stream

        _ev, stream = event_stream
        with _pytest.raises(InputError):
            dedup_stream(stream, [])
        with _pytest.raises(InputError):
            dedup_stream(stream, ["nope"])


class TestStreamIntervalJoin:
    def test_multibatch_equals_batch_join(self, spark, sf_dir, tmp_path):
        """Stream-stream interval join across MULTIPLE micro-batches
        (maxFilesPerTrigger=1 over time-ordered file splits) must emit
        exactly the batch interval join: watermarked state carries
        in-watermark rows across batch boundaries, so cross-boundary pairs
        are found, and nothing is double-emitted."""
        import time

        from epichypersketch_jl_spark.streaming.joins import stream_interval_join

        ev = (
            read_table(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select("event_id", "ts", "user_id", "event_type", "value")
        )
        # 4 time-ordered splits with increasing mtimes -> 4 micro-batches
        # in event-time order (the file source orders by mod time)
        src = str(tmp_path / "ev_split")
        bounds = [r[0] for r in ev.selectExpr(
            "percentile(unix_millis(ts), array(0.25, 0.5, 0.75)) as p"
        ).selectExpr("explode(p)").collect()]
        import os as _os

        _os.makedirs(src, exist_ok=True)
        lo = None
        for i, hi in enumerate(bounds + [None]):
            part = ev
            if lo is not None:
                part = part.filter(F.unix_millis("ts") > lo)
            if hi is not None:
                part = part.filter(F.unix_millis("ts") <= hi)
            part.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)  # distinct mtimes -> deterministic batch order
            lo = hi

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        views = stream.filter("event_type = 'view'").select("user_id", "event_id", "ts")
        buys = stream.filter("event_type = 'purchase'").select(
            "user_id", "event_id", "ts"
        )
        j = stream_interval_join(
            views, buys, key="user_id", max_delay="1 hour", watermark="48 hours"
        ).select(
            F.col("l_event_id").alias("va"),
            F.col("r_event_id").alias("pb"),
        )
        q = (
            j.writeStream.format("memory")
            .queryName("sjoin_mb")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_sj"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.va, r.pb) for r in spark.sql("select * from sjoin_mb").collect()
        }
        spark.catalog.dropTempView("sjoin_mb")
        vb = ev.filter("event_type = 'view'").select(
            F.col("user_id"), F.col("event_id").alias("va"), F.col("ts").alias("vts")
        )
        pb = ev.filter("event_type = 'purchase'").select(
            F.col("user_id"), F.col("event_id").alias("pb"), F.col("ts").alias("pts")
        )
        exact = {
            (r.va, r.pb)
            for r in vb.join(pb, "user_id")
            .filter("pts >= vts and pts <= vts + interval 1 hour")
            .collect()
        }
        assert got == exact
        assert len(exact) >= 1  # non-vacuous at every SF
