"""Streaming sinks and joins: foreachBatch exactly-once parquet,
watermarked stream-stream joins, and the Kafka source scaffold.

These complete the streaming surface beyond the windowed aggregations
in ``windows.py``:

- ``foreach_batch_parquet``: the production sink pattern for targets
  without a transactional streaming writer. Structured Streaming
  guarantees foreachBatch sees each (batch_id, data) pair at least
  once; idempotence comes from routing every micro-batch into a
  ``_batch_id=N`` partition written with dynamic partition overwrite —
  a retried batch replaces its own partition instead of duplicating
  rows. Readers just read the root path.
- ``purchase_attribution_stream``: a watermarked stream-stream
  interval join (purchases ⟕ preceding clicks per user). Both sides
  carry watermarks and the join condition bounds the event-time range,
  so state retention is finite: Spark buffers only clicks newer than
  (watermark - interval). The batch twin is the same expression on
  batch DataFrames — tested equal under availableNow.
- ``kafka_source`` / ``parse_kafka_json``: config scaffold for the
  production ingest path. The kafka connector JAR is not present in
  this environment, so ``kafka_source`` raises a clear error at use;
  ``parse_kafka_json`` (value-bytes -> typed columns) is pure
  DataFrame logic and is tested against batch data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def foreach_batch_parquet(path: str):
    """Returns a foreachBatch function writing each micro-batch to
    ``path`` partitioned by ``_batch_id`` with dynamic partition
    overwrite (idempotent under batch retry).

    Usage::

        q = (df.writeStream.foreachBatch(foreach_batch_parquet(out))
               .option("checkpointLocation", ckpt).start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return write_batch


def durable_incremental_cc_fold(spark: SparkSession, mapping_dir: str):
    """Returns a foreachBatch function maintaining a LIVING
    (node, component) mapping that SURVIVES driver crashes: each
    batch folds its edges into the mapping with
    ``connected_components_incremental`` and persists the result to
    ``mapping_dir/v_{batch_id}`` (parquet — the ``_SUCCESS`` marker
    is the commit record); a restarted query reloads the newest
    committed generation before folding its first replayed batch.

    Exactly-once RESULT from at-least-once execution: Structured
    Streaming replays any batch whose epoch wasn't committed to the
    stream checkpoint, so a crash between our parquet commit and the
    stream commit re-folds that batch onto a mapping that already
    contains it — and CC is confluent/idempotent (re-unioning edges
    cannot change the fixed point), so the replay is a no-op. This is
    the same write-ahead-generation discipline a production graph
    service uses; superseded generations older than the previous one
    are deleted to keep the directory two generations wide (current +
    crash-recovery fallback).

    Reference parity note: the reference engine has no streaming
    surface at all (SURVEY.md §2.3); this is the Spark-native
    maintenance pattern for its CC fixed point
    (ccf_connected_components.py:178 run_to_convergence) fed by an
    event stream."""
    import re
    import shutil

    from map_reduce_project_spark.graph.ccf import (
        connected_components,
        connected_components_incremental,
    )

    state: dict = {"mapping": None}

    def committed_generations() -> list[tuple[int, str]]:
        import os

        if not os.path.isdir(mapping_dir):
            return []
        gens = []
        for name in os.listdir(mapping_dir):
            m = re.fullmatch(r"v_(\d+)", name)
            full = os.path.join(mapping_dir, name)
            if m and os.path.exists(os.path.join(full, "_SUCCESS")):
                gens.append((int(m.group(1)), full))
        return sorted(gens)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        import os

        if batch_df.isEmpty():
            return
        if state["mapping"] is None:
            gens = committed_generations()
            if gens:  # restart: resume from the newest committed gen
                state["mapping"] = spark.read.parquet(gens[-1][1])
        if state["mapping"] is None:
            res = connected_components(batch_df)
        else:
            res = connected_components_incremental(
                state["mapping"], batch_df
            )
        out = os.path.join(mapping_dir, f"v_{batch_id:08d}")
        res.mapping.write.mode("overwrite").parquet(out)
        # read back the committed files: the live mapping is now
        # file-backed (no lineage into this batch's source), so the
        # next microbatch — or a restarted driver — folds on top of
        # durable state
        state["mapping"] = spark.read.parquet(out)
        for _, old in committed_generations()[:-2]:
            shutil.rmtree(old, ignore_errors=True)

    return fold


def purchase_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "1 hour",
) -> DataFrame:
    """Attribute each purchase to the clicks that preceded it within
    the attribution window, per user.

    Works on both batch and streaming inputs — the streaming caller
    must attach watermarks first (``purchase_attribution_stream``).
    The interval condition (click_ts in [purchase_ts - window,
    purchase_ts]) is what lets Structured Streaming bound the join
    state; an unconstrained stream-stream join would buffer forever.
    """
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        "user_id", "purchase_id", "purchase_ts", "purchase_value",
        "click_id", "click_ts",
    )


def purchase_attribution_stream(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join over a single event stream split by
    type. State bound: clicks older than (watermark + window) below
    the max event time are dropped from the join buffer."""
    purchases = events.where(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    clicks = events.where(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    return purchase_attribution(purchases, clicks, attribution_window)


def purchase_attribution_stream_outer(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    ``purchase_attribution_stream`` but purchases with no click in the
    window still emit (click columns null) once the watermark
    guarantees no match can arrive.

    Emission caveat (why this ships with property tests, not a hash
    gate): the inner matches are exact, and every emitted null row is
    a true no-match, but the exact point at which Spark evicts an
    unmatched left row and emits its null result depends on the
    internal state-watermark derivation from the time-range condition
    — rows near the end of a bounded stream (within roughly
    watermark-delay + window of max event time) may be withheld. On an
    unbounded production stream this is only ever a bounded delay, not
    a loss; tests pin exactly that contract (soundness always,
    completeness below a conservative horizon).
    """
    purchases = events.where(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    clicks = events.where(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "leftOuter",
    ).select(
        "user_id", "purchase_id", "purchase_ts", "purchase_value",
        "click_id", "click_ts",
    )


KAFKA_DEFAULTS = {
    # production ingest knobs, kept next to the reader so the scale
    # story is explicit: bound per-trigger volume, never block on a
    # slow broker, and start from the committed checkpoint offsets
    "startingOffsets": "earliest",
    "maxOffsetsPerTrigger": "1000000",
    "failOnDataLoss": "false",
}


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    **options: str,
) -> DataFrame:
    """Kafka readStream scaffold (requires the spark-sql-kafka
    connector on the classpath; not bundled in this environment —
    callers get a clear error rather than a silent misconfig).

    Returns the raw kafka frame (key binary, value binary, topic,
    partition, offset, timestamp, ...); pipe through
    ``parse_kafka_json`` for typed columns.
    """
    opts = {**KAFKA_DEFAULTS, **options}
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - connector not bundled
        raise RuntimeError(
            "kafka connector not available on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to "
            "spark.jars.packages"
        ) from exc


def parse_kafka_json(
    raw: DataFrame, schema: StructType, ts_col: str = "ts"
) -> DataFrame:
    """value bytes -> typed columns via from_json; keeps kafka
    metadata (topic/partition/offset) for lineage. Pure DataFrame
    logic — identical for the batch replay path, which is how it is
    tested without a broker."""
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), schema).alias("_j"),
    ).select("topic", "partition", "offset", "_j.*")
