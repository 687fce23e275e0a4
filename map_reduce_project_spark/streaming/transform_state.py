"""Custom stateful streaming via transformWithStateInPandas.

Spark 4.x's arbitrary-stateful successor to applyInPandasWithState:
instead of one opaque state tuple + one timeout per key, a
``StatefulProcessor`` gets named, typed state variables (value / list /
map state) and explicit event-time TIMERS. This module implements the
same gap-sessionizer contract as ``stateful.sessionize_with_state`` so
the two APIs are behaviorally interchangeable (pinned by test and by
the oracle gate: both emit exactly the sessions closed by a
gap-crossing successor or by the watermark passing last_event + gap).

At scale the state store shards by grouping key across
``spark.sql.shuffle.partitions`` RocksDB/HDFS state stores exactly as
for applyInPandasWithState; timers live in the same store and fire as
the watermark advances, so retention stays watermark-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from map_reduce_project_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
)


class GapSessionProcessor(StatefulProcessor):
    """Gap-based sessionizer: one ValueState (open session accumulator)
    + one event-time timer (fires at last_event + gap once the
    watermark passes it, closing the open session)."""

    def __init__(self, gap_seconds: int) -> None:
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.session = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        batch = pd.concat(list(rows)).sort_values("ts")
        if self.session.exists():
            start, last, n, sv = self.session.get()
            # drop the stale timer; we re-register at the new last_ts
            self.handle.deleteTimer(last // 1000 + self.gap_ms)
        else:
            start, last, n, sv = None, None, 0, 0.0

        for ts, value in zip(batch["ts"], batch["value"]):
            ts_us = int(ts.value) // 1000  # pandas ns -> us
            if start is None:
                start, last, n, sv = ts_us, ts_us, 1, float(value)
            elif ts_us - last > self.gap_us:
                closed.append((user_id, start, last, n, sv))
                start, last, n, sv = ts_us, ts_us, 1, float(value)
            else:
                last, n, sv = ts_us, n + 1, sv + float(value)

        self.session.update((start, last, n, sv))
        self.handle.registerTimer(last // 1000 + self.gap_ms)
        yield pd.DataFrame(closed, columns=OUTPUT_SCHEMA.names)

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if self.session.exists():
            start, last, n, sv = self.session.get()
            # a timer can only be live for the CURRENT open session
            # (handleInputRows deletes the stale one on every extend)
            closed.append((user_id, start, last, n, sv))
            self.session.clear()
        yield pd.DataFrame(closed, columns=OUTPUT_SCHEMA.names)

    def close(self) -> None:
        pass


def sessionize_transform_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """events(ts timestamp, user_id long, value double) -> closed
    sessions, via the transformWithStateInPandas API. Same emission
    contract as ``stateful.sessionize_with_state``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=GapSessionProcessor(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
