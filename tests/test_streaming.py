"""Structured Streaming: watermarked windows converge to batch results."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_project_spark.queries.events import ev_tumbling_q
from map_reduce_project_spark.streaming import (
    run_stream_to_memory,
    stream_events,
    stream_session_counts,
    stream_tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf0001):
    stream = stream_events(spark, sf0001)
    assert stream.isStreaming
    result = run_stream_to_memory(stream_tumbling_counts(stream))
    batch = ev_tumbling_q(spark, sf0001).select(
        "hour_start", "event_type", "n_events", "sum_value"
    )
    got = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in result.collect()
    }
    want = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want


def test_stream_sessions_complete(spark, sf0001):
    stream = stream_events(spark, sf0001)
    result = run_stream_to_memory(stream_session_counts(stream))
    total = result.agg(F.sum("n_events")).collect()[0][0]
    assert total == 1000  # every event lands in exactly one session


def test_rate_source_windowed_stream(spark):
    # unbounded built-in source: prove the windowing ops run against a
    # genuinely unbounded stream, not just replayed files
    import time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .selectExpr(
            "timestamp as ts",
            "value % 7 as user_id",
            "cast(value % 100 as double) as value",
        )
    )
    agg = (
        stream.withWatermark("ts", "2 seconds")
        .groupBy(F.window("ts", "1 second").start.alias("sec"), "user_id")
        .count()
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("rate_windows")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = 0
        while time.time() < deadline:
            rows = spark.table("rate_windows").count()
            if rows >= 7:
                break
            time.sleep(1)
        assert rows >= 7  # several windows x users materialized
    finally:
        query.stop()
