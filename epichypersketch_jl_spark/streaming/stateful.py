"""Custom stateful streaming operator via applyInPandasWithState:
per-key session tracking with timeout-based session emission.

This is the arbitrary-state complement to streaming/windows.py: window
aggregations cover time-bucketed reductions; sessionization needs state the
built-in window cannot express (gap-based session boundaries).  State per
key = (session_start, last_ts, n_events, total_value); a session closes
when the event-time gap exceeds `gap` (emitted on the next event) or when
the state times out under the watermark (emitted via timeout).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double, closed_by string"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def _sessionize_fn(gap_ms: int):
    def fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                    "closed_by": ["timeout"],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
        vals = rows["value"].to_numpy()
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = int(ts_ms[0]), int(ts_ms[0]), 0, 0.0
        out = []
        for t, v in zip(ts_ms, vals):
            t = int(t)
            # Out-of-order events (t <= last, still above the watermark) must
            # never move `last` backwards: a rewound `last` would make the
            # next in-order event falsely measure a > gap distance and close
            # the session early.  A late event merges into the current
            # session only if it is within gap of its window (extending
            # `start` backwards at most gap_ms); older stragglers belong to
            # an already-emitted session and are emitted as their own
            # singleton late session rather than stretching the current one
            # across a gap boundary.
            if t - last > gap_ms and n > 0:
                out.append((user_id, start, last, n, total, "gap"))
                start, n, total = t, 0, 0.0
            elif n > 0 and start - t > gap_ms:
                out.append((user_id, t, t, 1, float(v), "late"))
                continue
            start = min(start, t)
            last = max(last, t)
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last + gap_ms)
        if out:
            o = pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "total_value", "closed_by",
                ],
            )
            o["session_start"] = pd.to_datetime(o["session_start"], unit="ms")
            o["session_end"] = pd.to_datetime(o["session_end"], unit="ms")
            yield o

    return fn


def sessionize(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization of an event stream.

    Emits one row per closed session: closed by a later event arriving past
    the gap ("gap"), by event-time timeout under the watermark ("timeout"),
    or — for an above-watermark straggler older than the current session's
    reach — as a singleton "late" session.  State is bounded: one fixed-size
    tuple per active key.
    """
    qty = {"minute": 60_000, "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000,
           "second": 1_000, "seconds": 1_000}
    num, unit = gap.split()
    gap_ms = int(num) * qty[unit]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _sessionize_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
