"""Sources & sinks over the parquet star schema.

The reference's only source was a driver-side ``sc.parallelize`` of an
in-memory edge list (ccf_connected_components.py:207). The production
path here is columnar parquet scans — Catalyst pushes predicates and
prunes columns into the scan, which is the difference between reading
100 TB and reading the 2 columns x 3 partitions a query actually needs.

Tables (driver-provided, /root/testdata/sf*/): region nation customer
supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one star-schema table.

    Plain ``spark.read.parquet`` so every downstream ``select``/``where``
    reaches the scan as ReadSchema/PushedFilters (verify with
    ``df.explain("formatted")``).

    events.ts has shipped in two physical shapes across testdata
    generations — TIMESTAMP(NANOS) (reads as a nanos long under
    spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ). Normalize both
    to a UTC TIMESTAMP_LTZ at microsecond precision: watermarks and
    streaming event time require LTZ, and a UTC-pinned session makes
    window/date_trunc semantics match the UTC-naive DuckDB oracle.
    """
    if name == "events":
        # runtime-settable; required even when the caller's session was
        # built without it (the round driver builds its own session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """ts (bigint nanos | timestamp_ntz | timestamp) -> UTC timestamp.

    The NTZ cast relies on the session timezone being UTC (pinned in
    read_table / stream_events before any read), so the wall-clock
    micros are reinterpreted as the same UTC instant.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """CSV ingest. Always pass an explicit schema in production —
    ``inferSchema`` is a full extra pass over the data (fine for small
    files, a second 100 TB scan otherwise)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines ingest; same explicit-schema rule as CSV."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` produces hive-style directory
    partitioning, the unit of partition pruning for downstream scans
    (prune-able predicates on the partition columns never touch the
    skipped files)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modality: str = "application/octet-stream",
) -> DataFrame:
    """Raw media ingest via Spark's binaryFile source: one row per
    file, (path, modality, payload, n_bytes). The object-storage
    ingest path for images/audio/video — files become partition-local
    binary rows (no driver transfer), ready for the mapInPandas
    decode/resize/frame-sample stages in operators.multimodal.
    ``spark.sql.files.maxPartitionBytes`` governs packing of small
    files into partitions at scale.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        "path",
        F.lit(modality).alias("modality"),
        F.col("content").alias("payload"),
        F.col("length").alias("n_bytes"),
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — same columnar pushdown/pruning story as parquet for
    shops standardized on ORC."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw text ingest: one row per line, column ``value`` — the entry
    point for log/corpus files before text-analysis operators."""
    return spark.read.text(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str, schema: str | None = None
) -> DataFrame:
    """XML source (built into Spark 4): one row per ``row_tag``
    element. Schema inference scans the data twice — pass an explicit
    schema in production so ingestion is single-pass and type-stable."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, mode: str = "overwrite"
) -> None:
    """XML sink (built into Spark 4), one ``row_tag`` element per row."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
