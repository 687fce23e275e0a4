"""Scale utilities: salted agg/join correctness + bucketed-join plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_project_spark.operators.scale import (
    read_bucketed,
    salted_agg,
    salted_join,
    write_bucketed,
)
from map_reduce_project_spark.sources import read_table


def test_salted_agg_matches_plain(spark, sf0001):
    orders = read_table(spark, sf0001, "orders")
    plain = {
        (r.o_orderstatus,): (r.n, r.total)
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    salted = {
        (r.o_orderstatus,): (r.n, float(r.total))
        for r in salted_agg(
            orders.withColumn(
                "p", F.col("o_totalprice").cast("decimal(18,2)")
            ),
            ["o_orderstatus"],
            {"n": "count(*)", "total": "sum(p)"},
        )
        .withColumn("total", F.col("total").cast("double"))
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf0001):
    orders = read_table(spark, sf0001, "orders")
    cust = read_table(spark, sf0001, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in salted} == {
        (r.c_mktsegment, r["count"]) for r in plain
    }


def test_bucketed_join_has_no_shuffle(spark, sf0001):
    # tables land in ./spark-warehouse (gitignored); clean any stale
    # state first (a dangling directory without a metastore entry makes
    # saveAsTable fail with LOCATION_ALREADY_EXISTS)
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = read_table(spark, sf0001, "orders")
    li = read_table(spark, sf0001, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=4,
    )
    # sf0.001 is small enough that the planner would broadcast (which
    # disables bucketing); force the sort-merge path the bucketing is
    # for — at real scale neither side is broadcastable
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no Exchange feeding the SortMergeJoin
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_observed_quality_single_pass(spark):
    from map_reduce_project_spark.operators.observe import (
        observed_filter,
        observed_quality,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    out, obs = observed_quality(df, ["v"], name="q")
    assert out.count() == 4
    assert obs.get == {"n_rows": 4, "nulls_v": 2}

    filtered, before, after = observed_filter(
        df, F.col("v").isNotNull(), name="f"
    )
    assert filtered.count() == 2
    assert before.get["n_rows"] == 4
    assert after.get["n_rows"] == 2


def test_bloom_prune_join_exact_and_broadcast(spark, sf001):
    from map_reduce_project_spark.operators.scale import bloom_prune_join
    from map_reduce_project_spark.sources.io import read_table
    from pyspark.sql import functions as F

    li = read_table(spark, sf001, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    part = (
        read_table(spark, sf001, "part")
        .where(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    pruned = bloom_prune_join(li, part, "p_partkey")
    plain = li.join(part, "p_partkey")
    assert pruned.count() == plain.count()
    got = {tuple(r) for r in pruned.collect()}
    want = {tuple(r) for r in plain.collect()}
    assert got == want
    # the bucket pre-filter must be a broadcast semi join (no shuffle
    # of the big side before the exact join)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_zorder_locality_and_skipping(spark, sf001, tmp_path):
    from map_reduce_project_spark.operators.scale import (
        write_zordered,
        zorder_key,
    )
    from map_reduce_project_spark.sources.io import read_table
    from pyspark.sql import functions as F

    # two independent dims, both bounded < 2^16
    li = read_table(spark, sf001, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
    # unordered baseline: same file count, no clustering
    li.repartition(8).write.mode("overwrite").parquet(rpath)

    def avg_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return per_file.agg(F.avg("span")).collect()[0][0]

    # z-ordered files cover a fraction of each dim's domain; random
    # files cover essentially all of it
    for c in ("l_partkey", "l_suppkey"):
        assert avg_span(zpath, c) < 0.7 * avg_span(rpath, c), c

    # row counts survive the layout change
    assert spark.read.parquet(zpath).count() == li.count()

    # the morton key interleaves correctly: (x=1,y=0) -> 1, (0,1) -> 2,
    # (1,1) -> 3, (2,3) -> 0b1110 = 14
    probe = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 1), (2, 3)], "x long, y long"
    ).select(zorder_key(["x", "y"], bits=4).alias("z"))
    assert [r["z"] for r in probe.collect()] == [1, 2, 3, 14]
