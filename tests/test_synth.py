"""sources/synth.py: synthetic star schema must be a drop-in for the
driver testdata — same table names, same dtypes, valid foreign keys —
so any registry query can run against a synthesized directory."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_project_spark.sources.synth import (
    BASE_ROWS,
    synthesize_sf,
)


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_sf"))
    rows = synthesize_sf(spark, out, scale=0.01)
    return out, rows


ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def test_schema_parity_with_driver_testdata(spark, synth_dir):
    out, _ = synth_dir
    for t in ALL_TABLES:
        ref = spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet")
        got = spark.read.parquet(f"{out}/{t}.parquet")
        assert got.dtypes == ref.dtypes, t


def test_row_counts_and_foreign_keys(spark, synth_dir):
    out, rows = synth_dir
    for t, n in rows.items():
        assert (
            spark.read.parquet(f"{out}/{t}.parquet").count() == n
        ), t
    orders = spark.read.parquet(f"{out}/orders.parquet")
    lineitem = spark.read.parquet(f"{out}/lineitem.parquet")
    n_cust = rows["customer"]
    assert (
        orders.where(
            (F.col("o_custkey") < 0) | (F.col("o_custkey") >= n_cust)
        ).count()
        == 0
    )
    # every lineitem points at an existing order/part/supplier
    assert (
        lineitem.where(
            (F.col("l_orderkey") >= rows["orders"])
            | (F.col("l_partkey") >= rows["part"])
            | (F.col("l_suppkey") >= rows["supplier"])
        ).count()
        == 0
    )


def test_generation_is_deterministic(spark, synth_dir):
    out, _ = synth_dir
    from map_reduce_project_spark.sources.synth import lineitem_df

    a = lineitem_df(spark, 500, 125, 200, 10)
    b = lineitem_df(spark, 500, 125, 200, 10)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
