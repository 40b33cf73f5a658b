"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState``.

The batch twin (``events_sessionize`` in the driver contract, oracled
against DuckDB) derives sessions with windows over the complete table.
Streams can't window over "the complete table", so this operator keeps
ONE open session per user as state and closes it either when a
same-batch event arrives past the gap, or when the event-time watermark
passes ``last_ts + gap`` (state timeout) — the standard unbounded-input
formulation of the same semantics.

State per user (all int64, epoch seconds / scaled value):
    (session_start, last_ts, n_events, sum_scaled)

Output rows are CLOSED sessions only (append mode): a session is final
once emitted — exactly-once under checkpointing because emission is
driven by watermark progress, not wall clock.

Scale notes: state is grouped by user_id (the shuffle key), a few
dozen bytes per live user — at 100 TB the state store shards across
executors with the key space, and the watermark bounds its lifetime.
Values are summed as scaled int64 (the same determinism fix the batch
twin uses: float accumulation order is engine- and partition-dependent,
int64 is exact).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, ssum long"

GAP_SEC_DEFAULT = 1800
VALUE_SCALE = 10000


def _emit(user_id: int, start: int, last: int, n: int, ssum: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="s")],
            "session_end": [pd.Timestamp(last, unit="s")],
            "n_events": [n],
            "sum_value": [ssum / VALUE_SCALE],
        }
    )


def _sessionize_fn(gap_sec: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if state.hasTimedOut:
            start, last, n, ssum = state.get
            state.remove()
            yield _emit(user_id, start, last, n, ssum)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
        vals = (rows["value"] * VALUE_SCALE).round().astype("int64").to_numpy()

        if state.exists:
            start, last, n, ssum = state.get
        else:
            start = last = int(ts[0])
            n = 0
            ssum = 0

        out = []
        for t, v in zip(ts, vals):
            t = int(t)
            if n > 0 and t - last > gap_sec:
                out.append((start, last, n, ssum))
                start, n, ssum = t, 0, 0
            elif n == 0:
                start = t
            last, n, ssum = t, n + 1, ssum + int(v)

        state.update((start, last, n, ssum))
        # close via event-time timeout once the watermark passes the gap
        state.setTimeoutTimestamp((last + gap_sec) * 1000)
        for s in out:
            yield _emit(user_id, *s)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = GAP_SEC_DEFAULT,
    watermark: str = "1 second",
) -> DataFrame:
    """events stream (user_id, event_id, ts timestamp, value double) →
    closed-session rows.  Input must be a streaming DataFrame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            _sessionize_fn(gap_sec),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
