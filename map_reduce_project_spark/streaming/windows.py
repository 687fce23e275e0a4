"""Structured Streaming operators: watermarked event-time windows.

The batch twins in queries/events.py carry the DuckDB oracle; these
run the SAME window expressions under ``readStream`` with watermarks,
which is the production path for unbounded event streams. Tests drive
them with ``trigger(availableNow=True)`` against the parquet testdata
and assert the final state equals the batch result — the
batch/streaming unification Spark guarantees for append-able aggs.

Late data: the watermark bounds state; events later than the watermark
are dropped. At 100 TB-scale ingest the knobs that matter are the
watermark delay (state size vs completeness) and
``spark.sql.shuffle.partitions`` for the stateful agg (state store
count). applyInPandasWithState is the escape hatch for custom state
machines; the built-in window/session_window cover the standard ones.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """events.parquet as a file stream (schema pinned from a batch read).

    ts arrives as bigint nanos (nanosAsLong) or TIMESTAMP_NTZ micros
    depending on the testdata generation; normalize to a UTC
    TIMESTAMP exactly like sources.io.read_table — watermarks reject
    NTZ event-time columns.
    """
    from map_reduce_project_spark.sources.io import _normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file-stream source needs a directory; glob-filter to the one file
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_event_ts(stream)


def stream_tumbling_counts(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked hourly tumbling counts — streaming twin of
    queries.events.ev_tumbling_q."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("hour_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


def stream_session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked session windows — streaming twin of ev_sessions_q,
    with the identical output columns so the final state hash-matches
    the batch sessions oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "last_event", "n_events", "sum_value"
        )
    )


def stream_dedup_events(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on
    event_id — the unbounded-stream twin of batch dropDuplicates.

    State holds one entry per key only until the watermark passes it
    (bounded, unlike a plain streaming dropDuplicates whose state
    grows forever); duplicates arriving within the watermark window
    are suppressed, which is the at-least-once-ingest dedup contract:
    re-deliveries land seconds-to-minutes after the original, never
    beyond the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(
    streaming_df: DataFrame,
    query_name: str | None = None,
    output_mode: str = "complete",
) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a
    memory sink; returns the result as a batch DataFrame."""
    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt_")
    query = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = streaming_df.sparkSession
    return spark.table(name)


def stream_enriched_segment_counts(
    events: DataFrame,
    dims: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment + windowed agg: the most common
    production streaming shape (join each event to a slowly-changing
    dimension, then aggregate). The static side is broadcast — a
    stateless map-side hash join per micro-batch, no join state, no
    extra watermark bookkeeping; only the downstream window agg keeps
    state. At scale the dimension refreshes per micro-batch read, so
    a compacted dim table stays cheap to re-broadcast."""
    enriched = events.withWatermark("ts", watermark).join(
        F.broadcast(dims),
        events["user_id"] == dims["c_custkey"],
        "inner",
    )
    return (
        enriched.groupBy(
            F.window("ts", "1 day").start.alias("day_start"),
            "c_mktsegment",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


def stream_session_counts_dynamic(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked session windows with a PER-EVENT gap expression —
    the streaming twin of queries.events.ev_sessions_dynamic_gap_q
    (error events hold the session 5 minutes, others 30). Identical
    output columns, so the final state hash-matches the same
    running-horizon oracle."""
    gap = F.when(F.col("event_type") == "error", "5 minutes").otherwise(
        "30 minutes"
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
