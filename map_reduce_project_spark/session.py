"""SparkSession factory.

One place to set the execution knobs that matter at both test scale
(local[32], sf0.001-0.1) and target scale (1000-executor cluster,
~100 TB):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic broadcast conversion. At 100 TB the static
  ``spark.sql.shuffle.partitions`` is only an upper bound; AQE
  right-sizes each exchange from observed map output.
- ``spark.sql.shuffle.partitions`` defaults to the local core count
  (the guide's "~cores for local" rule); on a real cluster this should
  be 2-3x total executor cores — override via SPARK_GRAFT_SHUFFLE.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (DuckDB timestamps are UTC-naive).
- Arrow enabled for any toPandas()/pandas_udf boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "map_reduce_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors env overrides so the driver/bench harness can steer:
      SPARK_GRAFT_CPUS     -> local[N] parallelism (default local[*])
      SPARK_GRAFT_SHUFFLE  -> spark.sql.shuffle.partitions
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        default = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", default)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing (the default, made explicit):
        # AQE never coalesces below default parallelism, so iterative
        # checkpoints keep map-side parallelism = cores. (Measured: with
        # parallelismFirst=false a 2M-edge CCF iteration coalesced to 3
        # partitions and ran on 3 of 32 cores.) Tiny-graph loops bypass
        # AQE entirely via the fixed-point driver's small path.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet has shipped both TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS, ntz) across testdata generations; nanos
        # reads as long under this conf, and sources.io.read_table
        # normalizes either shape to a UTC timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
