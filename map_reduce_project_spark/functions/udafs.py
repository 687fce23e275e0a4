"""Pandas UDAFs (GROUPED_AGG) and grouped-map applyInPandas — the
per-group Python escape hatches.

Engine rule unchanged: built-in aggregates first (partial+final
HashAggregate, map-side combine, codegen). A GROUPED_AGG pandas_udf
ships each group's column to Python as one Arrow batch — no partial
aggregation, the whole group materializes on one executor — so it is
for aggregations the built-ins can't express, and group cardinality
must be bounded (a median over a per-key group of millions of rows
will spill). Grouped-map ``applyInPandas`` has the same shipping cost
plus a full shuffle on the keys; reach for it only when the per-group
logic is genuinely imperative.

Both paths here are hash-gated against DuckDB oracles
(``udaf_median_price``, ``ev_gaps_grouped`` queries): the UDAF
arithmetic is exact-integer median (avg-of-middles on int64 cents —
one IEEE division on exact operands), the grouped map emits integer
microsecond gaps — both engine-reproducible bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


@pandas_udf(DoubleType())
def median_long_udaf(v: pd.Series) -> float:
    """Exact median of an int64 column: middle element for odd counts,
    IEEE average of the two middles for even — matching DuckDB's
    ``median(BIGINT)`` exactly (the .5 average of two int64s is one
    correctly-rounded double op on exact operands)."""
    s = v.sort_values().reset_index(drop=True)
    n = len(s)
    if n == 0:
        return None
    mid = n // 2
    if n % 2:
        return float(s[mid])
    return (float(s[mid - 1]) + float(s[mid])) / 2.0


GAPS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("gap_us", LongType()),
    ]
)


def event_gaps_grouped(events: DataFrame) -> DataFrame:
    """Per-user inter-event gaps via grouped-map ``applyInPandas``:
    each user's events arrive as one pandas frame, sorted in Python,
    and the gap to the previous event is emitted in integer
    microseconds (-1 for the user's first event).

    The same result is one ``lag`` window in SQL — this operator
    exists to pin the grouped-map path (shuffle on key -> per-group
    Arrow batch -> Python -> Arrow back) under the exact gate, as the
    template for per-group logic that ISN'T window-expressible.

    Input columns: (user_id long, event_id long, ts timestamp).
    """

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = pdf["ts"].astype("int64") // 1000  # pandas ns -> us
        prev = us.shift(1)
        gap = (us - prev).fillna(-1).astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "gap_us": gap,
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(gaps, schema=GAPS_SCHEMA)
    )


def event_gaps_arrow(events: DataFrame) -> DataFrame:
    """``applyInArrow`` twin of ``event_gaps_grouped`` under the SAME
    oracle: per-user gaps computed on the raw Arrow table — no pandas
    materialization at all, which at scale removes the
    Arrow->pandas->Arrow copy pair per group (the applyInPandas tax)
    and keeps timestamps as int64 microseconds end to end (Spark's
    Arrow unit is already us, so the epoch arithmetic is a cast, not
    a ns division). Completes the Python-integration matrix:
    pandas_udf / UDTF / applyInPandas / mapInPandas / mapInArrow /
    applyInArrow, every member hash-gated.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def gaps(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        t = tbl.take(order)
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        gap = np.empty(len(us), dtype=np.int64)
        if len(us):
            gap[0] = -1
            gap[1:] = us[1:] - us[:-1]
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInArrow(gaps, schema=GAPS_SCHEMA)
    )
