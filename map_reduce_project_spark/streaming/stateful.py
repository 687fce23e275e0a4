"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

``F.session_window`` covers gap-based sessions; this module is the
pattern for session logic the built-in can't express (caps on session
length, per-session early emission, custom merge rules): Arrow-batched
per-key state machines with explicit state schema and timeouts.

State per user: (session_start_us, last_ts_us, n_events, sum_value).
Sessions are emitted when CLOSED — either a later event arrives past
the gap, or the event-time timeout fires after the watermark passes.
At scale the state store shards by the grouping key across
``spark.sql.shuffle.partitions`` state stores; the watermark bounds
state retention exactly as for the built-in windows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """events(ts timestamp, user_id long, value double) -> closed sessions."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[Any, ...]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n, sv = state.get
                closed.append((user_id, start, last, n, sv))
                state.remove()
            yield pd.DataFrame(closed, columns=OUTPUT_SCHEMA.names)
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, last, n, sv = state.get
        else:
            start, last, n, sv = None, None, 0, 0.0

        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = int(ts.value) // 1000  # pandas ns -> us
            if start is None:
                start, last, n, sv = ts_us, ts_us, 1, float(value)
            elif ts_us - last > gap_us:
                closed.append((user_id, start, last, n, sv))
                start, last, n, sv = ts_us, ts_us, 1, float(value)
            else:
                last, n, sv = ts_us, n + 1, sv + float(value)

        state.update((start, last, n, sv))
        # close the open session once the watermark passes gap past it
        state.setTimeoutTimestamp((last // 1000) + gap_seconds * 1000)
        yield pd.DataFrame(closed, columns=OUTPUT_SCHEMA.names)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
