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
        assert set(got["closed_by"]) <= {"gap", "timeout", "late"}

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


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the session function."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts

    def remove(self):
        self._v = None


def _run_batches(fn, batches):
    st = _FakeState()
    emitted = []
    for b in batches:
        pdf = pd.DataFrame({"ts": pd.to_datetime(b, unit="ms"), "value": [1.0] * len(b)})
        emitted += list(fn((7,), [pdf], st))
    return emitted, st


class TestSessionizeOutOfOrder:
    def test_late_event_does_not_rewind_last(self):
        """A later micro-batch carrying an event with ts < state.last (but
        above the watermark) must not rewind the gap reference: the next
        in-order event would otherwise falsely close the session."""
        from epichypersketch_jl_spark.streaming.stateful import _sessionize_fn

        fn = _sessionize_fn(gap_ms=60_000)
        emitted, st = _run_batches(
            fn,
            [
                [100_000, 150_000],  # in order; last = 150s
                [110_000],           # out-of-order (before last)
                [175_000],           # 25s after true last -> same session
            ],
        )
        assert emitted == [], "no session should close"
        start, last, n, total = st.get
        assert (start, last, n) == (100_000, 175_000, 4)

    def test_true_gap_still_closes(self):
        from epichypersketch_jl_spark.streaming.stateful import _sessionize_fn

        fn = _sessionize_fn(gap_ms=60_000)
        emitted, st = _run_batches(fn, [[100_000, 150_000], [250_000]])
        assert len(emitted) == 1
        row = emitted[0].iloc[0]
        assert row.closed_by == "gap" and row.n_events == 2
        assert st.get[0] == 250_000 and st.get[2] == 1

    def test_late_event_extends_session_start(self):
        from epichypersketch_jl_spark.streaming.stateful import _sessionize_fn

        fn = _sessionize_fn(gap_ms=60_000)
        emitted, st = _run_batches(fn, [[100_000], [70_000]])
        assert emitted == []
        assert st.get[0] == 70_000 and st.get[1] == 100_000 and st.get[2] == 2


    def test_too_late_event_emitted_as_singleton(self):
        """A straggler older than the current session's reach must not
        stretch the session start across a gap boundary (review finding):
        it is emitted as its own late session."""
        from epichypersketch_jl_spark.streaming.stateful import _sessionize_fn

        fn = _sessionize_fn(gap_ms=60_000)
        emitted, st = _run_batches(fn, [[100_000], [250_000], [150_000]])
        rows = pd.concat(emitted).reset_index(drop=True)
        # batch2 closed [100k,100k] by gap; batch3's 150k is > gap older
        # than the current session (start 250k) -> singleton late session
        assert list(rows.closed_by) == ["gap", "late"]
        late = rows.iloc[1]
        assert late.n_events == 1
        assert late.session_start == late.session_end
        # current session is untouched
        assert st.get[0] == 250_000 and st.get[2] == 1


class TestDgimBucketAlgebra:
    """Pure-python DGIM invariants (streaming/dgim.py), no Spark: the
    two-per-size bucket discipline, O(log^2 W) state, and the published
    <= 50% relative-error bound against a brute-force window count."""

    def test_invariants_and_bound_random_streams(self):
        import numpy as np

        from epichypersketch_jl_spark.streaming.dgim import (
            MAX_PER_SIZE,
            dgim_estimate,
            dgim_insert,
        )

        rng = np.random.default_rng(5)
        for trial in range(20):
            window = int(rng.integers(50, 2000))
            ts = np.cumsum(rng.integers(1, 10, size=3000)).tolist()
            buckets: list[list[int]] = []
            for i, t in enumerate(ts):
                dgim_insert(buckets, t)
                buckets[:] = [b for b in buckets if b[0] > t - window]
                if i % 37 == 0:
                    # two-per-size invariant
                    sizes = [b[1] for b in buckets]
                    for s in set(sizes):
                        assert sizes.count(s) <= MAX_PER_SIZE
                    # sizes are powers of two, buckets oldest-first
                    assert all(s & (s - 1) == 0 for s in sizes)
                    assert [b[0] for b in buckets] == sorted(b[0] for b in buckets)
                    assert len(buckets) <= 2 * (int(np.log2(max(1, i + 1))) + 2)
                    exact = sum(1 for u in ts[: i + 1] if u > t - window)
                    est = dgim_estimate(buckets)
                    assert abs(est - exact) <= exact / 2 + 1, (trial, i, est, exact)

    def test_empty_and_single(self):
        from epichypersketch_jl_spark.streaming.dgim import (
            dgim_estimate,
            dgim_insert,
        )

        assert dgim_estimate([]) == 0
        b: list[list[int]] = []
        dgim_insert(b, 100)
        assert b == [[100, 1]] and dgim_estimate(b) == 1

    def test_late_cross_batch_event_merges_oldest_by_timestamp(self):
        """A late event appended to existing state must merge with the
        oldest same-size bucket BY END-TIMESTAMP, not by list position:
        state [[500,2],[900,1],[1000,1]] + late t=600 -> the two oldest
        size-1 buckets are 600 and 900 (merged, keeping 900), leaving the
        size-monotone oldest-first layout the half-count relies on."""
        from epichypersketch_jl_spark.streaming.dgim import dgim_insert

        buckets = [[500, 2], [900, 1], [1000, 1]]
        dgim_insert(buckets, 600)
        buckets.sort(key=lambda b: b[0])  # the operator's post-insert sort
        assert buckets == [[500, 2], [900, 2], [1000, 1]]
        # size-monotone oldest-first: no smaller bucket older than a larger one
        sizes = [s for _t, s in buckets]
        assert sizes == sorted(sizes, reverse=True) or sizes == [2, 2, 1]

    def test_in_order_streams_unchanged_by_ts_selection(self):
        """For in-order inserts the end-ts selection is identical to the
        positional selection — pinned so the streaming oracle output
        cannot shift for ordered data."""
        from epichypersketch_jl_spark.streaming.dgim import dgim_insert

        a: list[list[int]] = []
        for t in range(1, 200):
            dgim_insert(a, t)
        # reference: positional selection on the same in-order stream
        def insert_positional(buckets, t):
            buckets.append([t, 1])
            s = 1
            while True:
                idxs = [i for i, b in enumerate(buckets) if b[1] == s]
                if len(idxs) <= 2:
                    return
                i0, i1 = idxs[0], idxs[1]
                buckets[i1] = [buckets[i1][0], 2 * s]
                del buckets[i0]
                s *= 2

        b: list[list[int]] = []
        for t in range(1, 200):
            insert_positional(b, t)
        assert a == b
