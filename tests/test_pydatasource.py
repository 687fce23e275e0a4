"""Custom Python DataSource: partition planning + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_project_spark.sources.pydatasource import (
    register,
    telemetry_row,
)


def _read(spark, n_rows=500, n_parts=4):
    register(spark)
    return (
        spark.read.format("synthetic_telemetry")
        .option("n_rows", n_rows)
        .option("n_partitions", n_parts)
        .load()
    )


def test_pydatasource_partition_parallel_scan(spark):
    df = _read(spark, 500, 4)
    # the reader's partition plan must become real scan tasks
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 4
    assert df.count() == 500


def test_pydatasource_rows_match_generator(spark):
    got = {r.row_id: (r.device, r.metric, r.reading)
           for r in _read(spark, 100, 3).collect()}
    assert len(got) == 100
    for rid in range(100):
        _, device, metric, reading = telemetry_row(rid)
        assert got[rid] == (device, metric, reading)


def test_pydatasource_filter_and_agg_compose(spark):
    # the source composes with ordinary Catalyst operators downstream
    df = _read(spark, 1000, 8)
    agg = (
        df.where(F.col("metric") == "temp")
        .groupBy("device")
        .agg(F.sum("reading").alias("s"))
    )
    expect = {}
    for rid in range(1000):
        _, device, metric, reading = telemetry_row(rid)
        if metric == "temp":
            expect[device] = expect.get(device, 0) + reading
    got = {r.device: r.s for r in agg.collect()}
    assert got == expect
