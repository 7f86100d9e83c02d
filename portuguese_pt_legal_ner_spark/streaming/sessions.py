"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (the brief's named seam for stateful logic
the built-in windowed aggregates can't express).

Semantics (the batch analog is __spark_entry__._q_events_sessions'
lag-window query): events for a user belong to one session until a
gap > `gap_sec` appears in event time. State per user = the open
session (start, last_ts, n_events); a closed session is EMITTED and
removed from state when either

  * a new event arrives more than `gap_sec` after the session's last
    event (gap close), or
  * the event-time watermark passes last_ts + gap_sec (timeout close —
    GroupStateTimeout.EventTimeTimeout), so sessions of idle users
    still flush without waiting for their next event.

State size is bounded by (active users), not stream length; rows
arrive per user via the hash exchange on the grouping key, Arrow-
batched — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, end_us, n)

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
                state.remove()
        else:
            ts_us_all = []
            for pdf in pdfs:
                # pandas datetime64[us/ns] → int epoch microseconds
                ts = pd.to_datetime(pdf["ts"])
                ts_us_all.extend(
                    (ts.astype("int64") // 1000).tolist()
                    if ts.dtype == "datetime64[ns]"
                    else ts.astype("int64").tolist()
                )
            ts_us_all.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = ts_us_all[0]
                n = 0
            for t_us in ts_us_all:
                if t_us - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, n = t_us, 0
                last_us = max(last_us, t_us)
                n += 1
            state.update((start_us, last_us, n))
            # flush the open session when the watermark passes its gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_sec * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """streaming events(user_id, ts, ...) → closed sessions. The input
    must carry a watermark on ts (drives both late-drop and the
    event-time timeout that closes idle sessions)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_sec),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_user_sessions(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_sec: int = 1800,
    delay: str = "0 seconds",
) -> None:
    """AvailableNow job: catch up on unseen event files, emit sessions
    closed by gap or watermark timeout, stop. Resumable: open sessions
    live in the state store across runs."""
    from .windowed import EVENTS_STREAM_SCHEMA  # noqa: PLC0415

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", delay)
    )
    q = (
        sessionize_stream(stream, gap_sec)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
