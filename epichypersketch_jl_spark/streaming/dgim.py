"""DGIM sliding-window counting over an event stream (Datar, Gionis,
Indyk, Motwani 2002): per-key "how many events in the last W of event
time" with O(log^2 W) state instead of buffering the window.

Buckets of exponentially growing sizes (at most two per size) cover the
window; each bucket remembers only the event time of its NEWEST member
and its size.  The estimate counts every bucket fully except the oldest,
which contributes half — the classic <= 50% relative-error guarantee.
This is the sliding-window member of the sketch family: the state is a
few dozen (ts, size) pairs per key no matter how many events the window
holds, which is what makes per-user windowed rates tractable on an
unbounded stream at 100-TB scale.

Implemented as the package's second custom stateful operator
(applyInPandasWithState, next to streaming/stateful.sessionize): state
per key = two parallel long arrays (bucket end-timestamps, bucket
sizes); each micro-batch folds its events in event-time order, cascades
the two-per-size merges, expires buckets past the window, and emits one
(key, asof, est, n_buckets) row.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DGIM_SCHEMA = "user_id long, asof timestamp, est long, n_buckets int"
DGIM_STATE_SCHEMA = "ts array<long>, sz array<long>"

#: DGIM invariant: at most this many buckets of each size (two gives the
#: published <= 50% error bound; more buckets per size tighten it).
MAX_PER_SIZE = 2


def dgim_insert(buckets: list[list[int]], t: int) -> None:
    """Append one event at time t and cascade the two-per-size merges.
    `buckets` is oldest-first [[end_ts, size], ...]; merging the two
    oldest same-size buckets keeps the NEWER end timestamp (the bucket's
    newest member).

    "Oldest" is decided by END-TIMESTAMP, not list position: a late
    cross-batch event is appended at the tail, so positional selection
    would merge the wrong pair (e.g. state [[500,2],[900,1],[1000,1]] +
    late t=600 must merge 600 with 900, not 900 with 1000) and break the
    size-monotone invariant the <= 50% bound and the oldest-bucket
    half-count rely on.  For in-order streams the two selections are
    identical."""
    buckets.append([t, 1])
    s = 1
    while True:
        idxs = sorted(
            (i for i, b in enumerate(buckets) if b[1] == s),
            key=lambda i: buckets[i][0],
        )
        if len(idxs) <= MAX_PER_SIZE:
            return
        i0, i1 = idxs[0], idxs[1]  # two oldest of this size by end-ts
        buckets[i1] = [buckets[i1][0], 2 * s]
        del buckets[i0]
        s *= 2


def dgim_estimate(buckets: list[list[int]]) -> int:
    """Total size minus half the oldest bucket (its members straddle the
    window boundary)."""
    if not buckets:
        return 0
    total = sum(b[1] for b in buckets)
    return total - buckets[0][1] // 2


def _dgim_fn(window_ms: int):
    def fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        ts_ms = sorted(int(t) for t in rows["ts"].astype("int64") // 1_000_000)
        if state.exists:
            old_ts, old_sz = state.get
            buckets = [[int(a), int(b)] for a, b in zip(old_ts, old_sz)]
        else:
            buckets = []
        for t in ts_ms:
            dgim_insert(buckets, t)
        # buckets may be mildly out of end-ts order under cross-batch
        # disorder; keep oldest-first so expiry and the oldest-bucket
        # half-count stay well defined
        buckets.sort(key=lambda b: b[0])
        asof = max(ts_ms[-1], buckets[-1][0])
        buckets = [b for b in buckets if b[0] > asof - window_ms]
        state.update(([b[0] for b in buckets], [b[1] for b in buckets]))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "asof": [pd.Timestamp(asof, unit="ms")],
                "est": [dgim_estimate(buckets)],
                "n_buckets": [len(buckets)],
            }
        )

    return fn


def dgim_counts(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Per-key DGIM sliding-window event counts over a stream; one row per
    (key, micro-batch) carrying the latest estimate.  State is O(log^2 W)
    per key."""
    qty = {"minute": 60_000, "minutes": 60_000, "hour": 3_600_000,
           "hours": 3_600_000, "second": 1_000, "seconds": 1_000}
    num, unit = window.split()
    window_ms = int(num) * qty[unit]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _dgim_fn(window_ms),
            outputStructType=DGIM_SCHEMA,
            stateStructType=DGIM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
