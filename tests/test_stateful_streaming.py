"""applyInPandasWithState sessionization: gap-closed and timeout-closed
sessions vs a batch recomputation of the same session definition."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.sources.tables import read_table
from epichypersketch_jl_spark.streaming.stateful import sessionize


def _batch_sessions(pdf: pd.DataFrame, gap_ms: int) -> pd.DataFrame:
    """Exact batch sessionization for comparison."""
    out = []
    for uid, grp in pdf.sort_values("ts").groupby("user_id"):
        ts = (grp["ts"].astype("int64") // 1_000_000).to_numpy()
        vals = grp["value"].to_numpy()
        start, last, n, total = ts[0], ts[0], 0, 0.0
        for t, v in zip(ts, vals):
            if t - last > gap_ms and n > 0:
                out.append((uid, start, last, n, total))
                start, n, total = t, 0, 0.0
            last = t
            n += 1
            total += float(v)
        out.append((uid, start, last, n, total))
    return pd.DataFrame(
        out, columns=["user_id", "start_ms", "end_ms", "n_events", "total_value"]
    )


class TestSessionize:
    def test_sessions_match_batch(self, spark, sf_dir, tmp_path):
        src = str(tmp_path / "ev")
        ev = (
            read_table(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select("user_id", "ts", "value")
        )
        ev.write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        sess = sessionize(stream, gap="30 minutes", watermark="1 minute")
        q = (
            sess.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = spark.sql("select * from sessions").toPandas()
        assert len(got) > 0
        assert set(got["closed_by"]) <= {"gap", "timeout"}

        exact = _batch_sessions(ev.toPandas(), 30 * 60_000)
        got["start_ms"] = got["session_start"].astype("int64") // 1_000_000
        got["end_ms"] = got["session_end"].astype("int64") // 1_000_000
        m = got.merge(exact, on=["user_id", "start_ms"], suffixes=("", "_e"))
        assert len(m) == len(got), "every emitted session must exist in batch recompute"
        assert (m["n_events"] == m["n_events_e"]).all()
        assert (m["end_ms"] == m["end_ms_e"]).all()
        assert (abs(m["total_value"] - m["total_value_e"]) < 1e-9).all()
        # most sessions should be emitted (watermark withholds only the tail)
        assert len(got) >= 0.8 * len(exact)
