"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

The batch sessionizer (``__spark_entry__.q_sessionize``) is a window + prefix
sum; the streaming version cannot see the whole history, so it keeps per-user
state: (session start, last event time, count).  A session closes when a new
event arrives after the gap, or when the processing-time timeout fires with
no new events — emitting one immutable row per closed session (append mode),
so the sink can be the idempotent bundle/bulk writer.

Scale notes: the stream shuffles by user_id and each task owns a key range;
state size is O(active users) and bounded by timeout eviction.  Arrow moves
the per-group batches; state is three bigints per user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint"


def streaming_sessionize(
    events: DataFrame, gap_seconds: int = 30 * 60, timeout: str = "none"
) -> DataFrame:
    """events stream (user_id, ts, ...) -> closed-session rows.

    ``timeout="processing"`` evicts idle sessions after ``gap_seconds`` of
    processing time — the right mode for a continuously-running query, but it
    keeps an ``availableNow`` drain alive until the wall-clock timeout fires
    (observed: the query loops 'no new data but cleaning up state'), so the
    default ``"none"`` closes sessions only on gap-exceeding events and lets
    batch-style drains terminate; trailing sessions simply stay open in
    state for the next drain.
    """
    gap_us = gap_seconds * 1_000_000
    use_timeout = timeout == "processing"

    def sessionize_group(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        def emit(start: int, last: int, n: int) -> None:
            closed.append(
                (user_id, pd.Timestamp(start, unit="us"), pd.Timestamp(last, unit="us"), n)
            )

        if state.hasTimedOut:
            if state.exists:
                emit(*state.get)
                state.remove()
        else:
            ts_us = sorted(
                int(pd.Timestamp(t).value // 1000)  # ns -> us
                for pdf in batches
                for t in pdf["ts"]
            )
            if state.exists:
                start, last, n = state.get
            elif ts_us:
                start, last, n = ts_us[0], ts_us[0], 0
            else:
                return
            for t in ts_us:
                if n > 0 and t - last > gap_us:
                    emit(start, last, n)
                    start, n = t, 0
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)

        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
