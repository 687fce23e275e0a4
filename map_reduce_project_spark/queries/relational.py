"""Relational operator surface over the star schema.

Covers every category in SURVEY.md §2.3: scan/filter/project, joins
(inner/left/semi/anti/broadcast), hash aggregation (sum/avg/min/max/
count/count-distinct), grouping sets (rollup/cube), window functions
(top-k per group, running aggregates), sort/limit/top-k, set ops,
scalar string/date/math functions, and JSON extraction.

Hash-stability rules (the driver compares value hashes vs DuckDB):
- SUM over doubles is order-dependent; both sides aggregate exact
  DECIMAL casts, then cast the result to DOUBLE.
- AVG is computed as double(sum_decimal)/count — a single IEEE double
  division of identical operands on both sides.
- Every LIMIT/top-k query carries a unique total-order tiebreaker so
  the selected SET is deterministic.
- No libm-dependent functions (ln/exp/pow) in outputs; sqrt is IEEE
  correctly-rounded and therefore safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_reduce_project_spark.functions.exact import (
    limb_exact_double as _limb_exact_double,
)
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

DEC = "decimal(18,2)"  # all money/qty columns are 2-decimal doubles


def _dsum(col, alias: str):
    """Order-independent sum: exact decimal aggregation, double result."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def _davg(col, alias: str):
    """avg = double(decimal sum) / count — identical IEEE op both sides."""
    return (
        F.sum(col.cast(DEC)).cast("double") / F.count(col)
    ).alias(alias)


# --- Q1: pricing summary (filter + group agg, TPC-H Q1 shape) ---------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    charge = disc_price * (F.lit(1).cast(DEC) + F.col("l_tax").cast(DEC))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            _davg(F.col("l_quantity"), "avg_qty"),
            _davg(F.col("l_extendedprice"), "avg_price"),
            _davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q2: scan + filter + project (pushdown shape) ----------------------------


def q2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.where(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 200000.0)
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        F.year("o_orderdate").cast("long").alias("order_year"),
    )


Q2_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
       CAST(year(o_orderdate) AS BIGINT) AS order_year
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
"""


# --- Q3: join + agg + deterministic top-k (TPC-H Q3 shape) -------------------


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --- Q4: semi-join existence + count (TPC-H Q4 shape) ------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    late = li.where(F.col("l_shipdate") > F.lit("1999-01-01")).select(
        "l_orderkey"
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1999-01-01')
GROUP BY o_orderpriority
"""


# --- Q5: multi-join with broadcast dims (TPC-H Q5 shape) ---------------------


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- Q6: single-pass filtered aggregate (TPC-H Q6 shape) ---------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * F.col("l_discount").cast(DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- Q7: group stats incl. count-distinct, min/max ---------------------------


def q7_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        _davg(F.col("c_acctbal"), "avg_bal"),
    )


Q7_SQL = """
SELECT c_mktsegment,
  COUNT(*) AS n_customers,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  MIN(c_acctbal) AS min_bal,
  MAX(c_acctbal) AS max_bal,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
FROM customer
GROUP BY c_mktsegment
"""


# --- Q8: window top-k per group ----------------------------------------------


def q8_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q8_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
"""


# --- Q9: window running aggregate ---------------------------------------------


def q9_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


Q9_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
  AS running_total
FROM orders
"""


# --- Q10/Q11: anti & semi joins ----------------------------------------------


def q10_customers_without_urgent_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


Q10_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def q11_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    open_orders = orders.where(F.col("o_orderstatus") == "P")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


Q11_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


# --- Q12: set operations -------------------------------------------------------


def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    rich = cust.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    union = building.union(rich).distinct().select(
        F.lit("union").alias("op"), "c_custkey"
    )
    inter = building.intersect(rich).select(
        F.lit("intersect").alias("op"), "c_custkey"
    )
    minus = building.exceptAll(rich).select(
        F.lit("except").alias("op"), "c_custkey"
    )
    return union.unionAll(inter).unionAll(minus)


Q12_SQL = """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM building EXCEPT ALL SELECT c_custkey FROM rich)
"""


# --- Q13: rollup grouping sets -------------------------------------------------


def q13_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        _dsum(F.col("c_acctbal"), "total_bal"),
    )


Q13_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


# --- Q14: conditional aggregation (promo share, TPC-H Q14 shape) ---------------


def q14_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(
                F.when(F.col("p_type") == "ECONOMY", revenue).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).cast("double")
            / F.sum(revenue).cast("double")
        ).alias("economy_share"),
        F.count("*").alias("n_rows"),
    )


Q14_SQL = """
SELECT
  CAST(SUM(CASE WHEN p_type = 'ECONOMY'
    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
  AS economy_share,
  COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- Q15: scalar string/date/math functions ------------------------------------


def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.abs(F.col("c_acctbal")).alias("abs_bal"),
        F.floor(F.col("c_acctbal")).cast("long").alias("floor_bal"),
        F.ceil(F.col("c_acctbal") / 100.0).cast("long").alias("bal_bucket"),
        F.sqrt(F.abs(F.col("c_acctbal"))).alias("sqrt_bal"),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_class"),
    )


Q15_SQL = """
SELECT c_custkey,
  UPPER(c_name) AS name_upper,
  CAST(LENGTH(c_name) AS BIGINT) AS name_len,
  SUBSTRING(c_name, 1, 8) AS name_prefix,
  CONCAT_WS('|', c_mktsegment, c_name) AS tagged,
  REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS masked,
  ABS(c_acctbal) AS abs_bal,
  CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
  CAST(CEIL(c_acctbal / 100.0) AS BIGINT) AS bal_bucket,
  SQRT(ABS(c_acctbal)) AS sqrt_bal,
  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
       WHEN c_acctbal < 1000 THEN 'low'
       ELSE 'high' END AS bal_class
FROM customer
WHERE c_custkey <= 500
"""


# --- Q16: date/time functions ---------------------------------------------------


def q16_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "total_revenue"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


Q16_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY 1, 2
"""


# --- Q17: JSON extraction -------------------------------------------------------


def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            _dsum(F.col("value"), "sum_value"),
        )
    )


Q17_SQL = """
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


# --- Q18: global top-k ----------------------------------------------------------


def q18_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


Q18_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# --- Q19: having + left join aggregate ------------------------------------------


def q19_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "total_spent"),
        )
        .where(F.col("n_orders") >= 12)
    )
    return cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey
    ).select("c_custkey", "c_name", "n_orders", "total_spent")


Q19_SQL = """
SELECT c_custkey, c_name, n_orders, total_spent
FROM customer
JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
) ON c_custkey = o_custkey
"""


QUERIES = [
    Query("q1_pricing_summary", q1_pricing_summary, Q1_SQL, "filter + hash agg w/ decimal-exact sums (TPC-H Q1 shape)"),
    Query("q2_filter_project", q2_filter_project, Q2_SQL, "scan + pushdown filter + projection"),
    Query("q3_top_revenue_orders", q3_top_revenue_orders, Q3_SQL, "3-way join + agg + deterministic top-10"),
    Query("q4_order_priority", q4_order_priority, Q4_SQL, "semi-join existence + count"),
    Query("q5_region_revenue", q5_region_revenue, Q5_SQL, "6-way join w/ broadcast dims + agg"),
    Query("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, "single-pass filtered aggregate"),
    Query("q7_segment_stats", q7_segment_stats, Q7_SQL, "group stats: count-distinct, min/max/avg"),
    Query("q8_topk_per_customer", q8_topk_per_customer, Q8_SQL, "window row_number top-k per group"),
    Query("q9_running_total", q9_running_total, Q9_SQL, "window running sum (decimal-exact)"),
    Query("q10_customers_without_urgent", q10_customers_without_urgent_orders, Q10_SQL, "anti join"),
    Query("q11_customers_with_open_orders", q11_customers_with_open_orders, Q11_SQL, "semi join"),
    Query("q12_set_ops", q12_set_ops, Q12_SQL, "union/intersect/except"),
    Query("q13_rollup_region_nation", q13_rollup_region_nation, Q13_SQL, "rollup grouping sets"),
    Query("q14_brand_share", q14_brand_share, Q14_SQL, "conditional aggregation ratio"),
    Query("q15_scalar_functions", q15_scalar_functions, Q15_SQL, "string/math/case scalar functions"),
    Query("q16_date_functions", q16_date_functions, Q16_SQL, "date part extraction + agg"),
    Query("q17_json_extract", q17_json_extract, Q17_SQL, "JSON property extraction + agg"),
    Query("q18_global_topk", q18_global_topk, Q18_SQL, "global order-by + limit"),
    Query("q19_big_customers", q19_big_customers, Q19_SQL, "agg subquery + having + join"),
]


def q57_set_ops_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL —
    which keep duplicate multiplicity where q12's DISTINCT variants
    collapse it: the per-customer order-priority bags of two status
    classes compared with multiplicity preserved. Spark's
    intersectAll/exceptAll plan as a single aggregate-style exchange,
    not a distinct + join."""
    orders = read_table(spark, sf_dir, "orders")
    left = orders.where(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderpriority"
    )
    right = orders.where(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderpriority"
    )
    inter = left.intersectAll(right).select(
        F.lit("intersect_all").alias("op"), "o_custkey", "o_orderpriority"
    )
    exc = left.exceptAll(right).select(
        F.lit("except_all").alias("op"), "o_custkey", "o_orderpriority"
    )
    return inter.unionAll(exc)


Q57_SQL = """
WITH l AS (
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
),
r AS (
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
SELECT 'intersect_all' AS op, o_custkey, o_orderpriority
FROM (SELECT * FROM l INTERSECT ALL SELECT * FROM r)
UNION ALL
SELECT 'except_all' AS op, o_custkey, o_orderpriority
FROM (SELECT * FROM l EXCEPT ALL SELECT * FROM r)
"""

QUERIES.append(
    Query(
        "q57_set_ops_all",
        q57_set_ops_all_q,
        Q57_SQL,
        "INTERSECT ALL / EXCEPT ALL bag semantics with multiplicity preserved",
    )
)


def q58_supplier_hhi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration per part: the Herfindahl–Hirschman index
    over each part's supplier shipment shares — HHI = Σ n_i² / (Σ n_i)²
    computed entirely from exact integer counts (one division at the
    end), flagging single-sourced parts (HHI = 1) before they bite.
    Two aggregates on the same key; the squared-count sum rides the
    partial aggregation.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count("*").alias("n")
    )
    per_part = per_supp.groupBy("l_partkey").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        F.count("*").alias("n_suppliers"),
    )
    hhi = F.col("sum_sq").cast("double") / (
        F.col("total").cast("double") * F.col("total").cast("double")
    )
    return per_part.select(
        "l_partkey",
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        F.col("total").cast("long").alias("n_shipments"),
        hhi.alias("hhi"),
        (hhi >= 0.5).alias("concentrated"),
    )


Q58_SQL = """
WITH per_supp AS (
  SELECT l_partkey, l_suppkey, COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(n * n) AS BIGINT) AS sum_sq,
         COUNT(*) AS n_suppliers
  FROM per_supp GROUP BY l_partkey
)
SELECT l_partkey,
  CAST(n_suppliers AS BIGINT) AS n_suppliers,
  total AS n_shipments,
  CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS hhi,
  CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) >= 0.5
    AS concentrated
FROM per_part
"""

QUERIES.append(
    Query(
        "q58_supplier_hhi",
        q58_supplier_hhi_q,
        Q58_SQL,
        "Herfindahl supply-concentration per part from exact integer count moments",
    )
)


def q59_revenue_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    whale-dependence number: G = 2·Σ(i·x_i) / (n·Σx_i) − (n+1)/n over
    ascending per-customer revenue. Revenue is exact int64 cents and
    every sum is integer; the coefficient is one fixed expression of
    four integers, so the statistic is engine-exact. The ascending
    rank is a global sort of the per-customer table (customer-count
    rows, not order rows) — at extreme scale swap in the two-pass
    zipWithIndex rank used by the vocabulary builder.
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev"))
    w = Window.orderBy("rev", "o_custkey")
    ranked = per_cust.withColumn("i", F.row_number().over(w).cast("long"))
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("sx"),
        # the rank-weighted sum crosses 2^53 at sf0.1 and int64 at
        # ~sf1 — accumulate in decimal and convert limb-exactly
        F.sum(
            (F.col("i") * F.col("rev")).cast("decimal(38,0)")
        ).alias("sixd"),
    )
    n = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * _limb_exact_double(F.col("sixd"))
        / (n * F.col("sx").cast("double"))
        - (n + 1.0) / n
    )
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("total_cents"),
        gini.alias("gini"),
    )


Q59_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev,
         CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS i
  FROM per_cust
),
s AS (
  SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS sx,
         SUM(CAST(i AS HUGEINT) * rev) AS sixr
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers, sx AS total_cents,
  2.0 * ((CAST((((sixr - sixr % 1125899906842624) // 1125899906842624) - ((sixr - sixr % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((sixr - sixr % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(sixr % 1125899906842624 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
  - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
"""

QUERIES.append(
    Query(
        "q59_revenue_gini",
        q59_revenue_gini_q,
        Q59_SQL,
        "Gini coefficient of customer revenue from exact integer rank-weighted sums",
    )
)


def q60_share_of_total_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total analytics: each nation's revenue, its share of
    the global total, and its share within its region — two window
    sums over the small aggregate (never over facts), exact cents and
    single divisions.
    """
    from pyspark.sql.window import Window

    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    per_nation = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(cents).alias("rev"))
    )
    w_all = Window.partitionBy()
    w_reg = Window.partitionBy("n_regionkey")
    return per_nation.select(
        F.col("n_regionkey").cast("long").alias("regionkey"),
        F.col("n_name").alias("nation"),
        F.col("rev").cast("long").alias("revenue_cents"),
        (F.col("rev").cast("double") / F.sum("rev").over(w_all).cast("double")).alias(
            "share_global"
        ),
        (F.col("rev").cast("double") / F.sum("rev").over(w_reg).cast("double")).alias(
            "share_region"
        ),
    )


Q60_SQL = """
WITH per_nation AS (
  SELECT n_regionkey, n_name,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_regionkey, n_name
)
SELECT CAST(n_regionkey AS BIGINT) AS regionkey, n_name AS nation,
  rev AS revenue_cents,
  CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share_global,
  CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY n_regionkey) AS DOUBLE)
    AS share_region
FROM per_nation
"""

QUERIES.append(
    Query(
        "q60_share_of_total",
        q60_share_of_total_q,
        Q60_SQL,
        "share-of-total windows over the nation aggregate, exact cents",
    )
)


def q62_fuzzy_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: each sampled part's nearest other part
    name by Levenshtein edit distance (tie -> lowest key) — the
    entity-resolution suggestion pass. The sampled probe side is
    broadcast against the name dimension; at scale the quadratic
    kernel runs per blocking bucket (first-k-chars or phonetic key),
    exactly like the dedup banding story.
    """
    from pyspark.sql.window import Window

    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    probes = part.where(F.col("p_partkey") % 200 == 0).selectExpr(
        "p_partkey as probe_key", "p_name as probe_name"
    )
    pairs = (
        F.broadcast(probes)
        .crossJoin(part)
        .where(F.col("probe_key") != F.col("p_partkey"))
        .select(
            "probe_key",
            "probe_name",
            "p_partkey",
            "p_name",
            F.levenshtein("probe_name", "p_name").cast("long").alias("dist"),
        )
    )
    w = Window.partitionBy("probe_key").orderBy("dist", "p_partkey")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 1)
        .select("probe_key", "probe_name", "p_partkey", "p_name", "dist")
    )


Q62_SQL = """
WITH probes AS (
  SELECT p_partkey AS probe_key, p_name AS probe_name
  FROM part WHERE p_partkey % 200 = 0
),
pairs AS (
  SELECT probe_key, probe_name, p.p_partkey, p.p_name,
         CAST(levenshtein(probe_name, p.p_name) AS BIGINT) AS dist
  FROM probes CROSS JOIN part p
  WHERE probe_key <> p.p_partkey
)
SELECT probe_key, probe_name, p_partkey, p_name, dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_key
         ORDER BY dist, p_partkey) AS r
  FROM pairs
) WHERE r <= 1
"""

QUERIES.append(
    Query(
        "q62_fuzzy_match",
        q62_fuzzy_match_q,
        Q62_SQL,
        "nearest part name by Levenshtein distance (entity-resolution suggestions)",
    )
)


def q62_fuzzy_match_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path q62's docstring promises (round-12): the SAME
    probe set (``p_partkey % 200 == 0``) matched per BLOCKING BUCKET —
    first-4-chars of the name — so the Levenshtein kernel is quadratic
    only within a bucket and NOTHING unbounded is ever broadcast. The
    probe side grows linearly with the corpus, so q62's
    broadcast-probes × dimension plan stops being free at sf100; here
    both sides shuffle on the blocking key (``hint("merge")`` pins the
    sort-merge join so tiny test inputs plan the same shape the
    cluster would — test_plans asserts no broadcast/cross join in this
    plan). The price of blocking is recall: a probe's true nearest
    neighbor in a DIFFERENT first-4-chars bucket is missed — the
    standard ER blocking trade, same as the dedup family's LSH bands.
    """
    from pyspark.sql.window import Window

    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    blocked = part.select(
        "p_partkey", "p_name", F.substring("p_name", 1, 4).alias("blk")
    )
    probes = blocked.selectExpr(
        "p_partkey as probe_key", "p_name as probe_name", "blk"
    ).where(F.col("probe_key") % 200 == 0)
    pairs = (
        probes.hint("merge")
        .join(blocked, "blk")
        .where(F.col("probe_key") != F.col("p_partkey"))
        .select(
            "probe_key",
            "probe_name",
            "p_partkey",
            "p_name",
            F.levenshtein("probe_name", "p_name").cast("long").alias("dist"),
        )
    )
    w = Window.partitionBy("probe_key").orderBy("dist", "p_partkey")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 1)
        .select("probe_key", "probe_name", "p_partkey", "p_name", "dist")
    )


Q62_BLOCKED_SQL = """
WITH blocked AS (
  SELECT p_partkey, p_name, substring(p_name, 1, 4) AS blk FROM part
),
probes AS (
  SELECT p_partkey AS probe_key, p_name AS probe_name, blk
  FROM blocked WHERE p_partkey % 200 = 0
),
pairs AS (
  SELECT probe_key, probe_name, b.p_partkey, b.p_name,
         CAST(levenshtein(probe_name, b.p_name) AS BIGINT) AS dist
  FROM probes JOIN blocked b USING (blk)
  WHERE probe_key <> b.p_partkey
)
SELECT probe_key, probe_name, p_partkey, p_name, dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_key
         ORDER BY dist, p_partkey) AS r
  FROM pairs
) WHERE r <= 1
"""

QUERIES.append(
    Query(
        "q62_fuzzy_match_blocked",
        q62_fuzzy_match_blocked_q,
        Q62_BLOCKED_SQL,
        "q62's probe set under first-4-chars blocking — per-bucket quadratic kernel, no unbounded broadcast",
    )
)


def q64_blocked_fuzzy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching — the scale-true entity-resolution
    formulation (vs q62's broadcast-probe variant): candidates are
    generated ONLY within a shared blocking key (the name's first
    token), so the Levenshtein kernel is quadratic per block, never
    per corpus. Shuffle key = block; at 100 TB this is the same
    banding story as the dedup family — no cross join exists in the
    plan at any scale.

    Output: per part (restricted to one block's worth of probes for a
    bounded result), its nearest same-block neighbor by edit distance
    (tie -> lowest key).
    """
    from pyspark.sql.window import Window

    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    blocked = part.select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
    )
    left = blocked.selectExpr(
        "p_partkey as probe_key", "p_name as probe_name", "blk"
    ).where(F.col("probe_key") % 50 == 0)
    pairs = (
        left.join(blocked, "blk")
        .where(F.col("probe_key") != F.col("p_partkey"))
        .select(
            "probe_key",
            "probe_name",
            "p_partkey",
            "p_name",
            F.levenshtein("probe_name", "p_name").cast("long").alias("dist"),
        )
    )
    w = Window.partitionBy("probe_key").orderBy("dist", "p_partkey")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 1)
        .select("probe_key", "probe_name", "p_partkey", "p_name", "dist")
    )


Q64_SQL = """
WITH blocked AS (
  SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk FROM part
),
probes AS (
  SELECT p_partkey AS probe_key, p_name AS probe_name, blk
  FROM blocked WHERE p_partkey % 50 = 0
),
pairs AS (
  SELECT probe_key, probe_name, b.p_partkey, b.p_name,
         CAST(levenshtein(probe_name, b.p_name) AS BIGINT) AS dist
  FROM probes JOIN blocked b USING (blk)
  WHERE probe_key <> b.p_partkey
)
SELECT probe_key, probe_name, p_partkey, p_name, dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_key
         ORDER BY dist, p_partkey) AS r
  FROM pairs
) WHERE r <= 1
"""

QUERIES.append(
    Query(
        "q64_blocked_fuzzy",
        q64_blocked_fuzzy_q,
        Q64_SQL,
        "within-block nearest name by edit distance (scale-true ER blocking)",
    )
)


def q65_subqueries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI subquery surface in one text BOTH engines execute
    verbatim (the q33 pattern): a correlated scalar subquery (each
    nation's max account balance), EXISTS (nations with at least one
    mid-balance customer), and NOT IN over a non-null key set (the
    three-valued-logic trap is dodged deliberately — the subquery
    projects a non-nullable key — and documented here because NOT IN
    with NULLs returning zero rows is the classic production
    surprise). Catalyst decorrelates all three into joins/semi-joins;
    nothing here is row-at-a-time.
    """
    for t in ("customer", "nation"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"q65_{t}")
    return spark.sql(Q65_TEXT.format(c="q65_customer", n="q65_nation"))


Q65_TEXT = """
SELECT n.n_name AS nation,
       CAST(ROUND((SELECT MAX(c.c_acctbal) FROM {c} c
             WHERE c.c_nationkey = n.n_nationkey) * 100) AS BIGINT)
         AS max_bal_cents,
       EXISTS (SELECT 1 FROM {c} c
               WHERE c.c_nationkey = n.n_nationkey
                 AND c.c_acctbal BETWEEN 1000 AND 2000) AS has_mid,
       n.n_nationkey NOT IN (SELECT c.c_nationkey FROM {c} c
                             WHERE c.c_acctbal < 0) AS no_debtors
FROM {n} n
ORDER BY nation
"""

QUERIES.append(
    Query(
        "q65_subqueries",
        q65_subqueries_q,
        Q65_TEXT.format(c="customer", n="nation"),
        "correlated scalar / EXISTS / NOT IN subqueries, one shared SQL text",
    )
)


def q66_string_fns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide scalar string-function parity sweep in one projection —
    §2.3's scalar row pinned value-exact across engines for 16
    functions: case, trim/pad, translate/replace, slicing, search,
    repetition, reversal, codes. One narrow map over the scan, fully
    codegen'd; the point is breadth of the function surface under the
    hash gate, not the plan."""
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.ltrim(F.rtrim(F.col("p_name"))).alias("trimmed"),
        F.lpad("p_name", 30, ".").alias("lpadded"),
        F.rpad("p_name", 30, "_").alias("rpadded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("translated"),
        F.regexp_replace("p_name", " ", "-").alias("dashed"),
        F.substring("p_name", 3, 7).alias("sliced"),
        F.left(F.col("p_name"), F.lit(4)).alias("l4"),
        F.right(F.col("p_name"), F.lit(4)).alias("r4"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.repeat(F.left(F.col("p_name"), F.lit(2)), 3).alias("rep"),
        F.reverse(F.col("p_name")).alias("rev"),
        F.length("p_name").cast("long").alias("len"),
        F.ascii("p_name").cast("long").alias("first_code"),
        F.concat_ws("|", F.lit("p"), "p_name").alias("joined"),
    )


Q66_SQL = """
SELECT p_partkey,
  upper(p_name) AS up,
  ltrim(rtrim(p_name)) AS trimmed,
  lpad(p_name, 30, '.') AS lpadded,
  rpad(p_name, 30, '_') AS rpadded,
  translate(p_name, 'aeiou', 'AEIOU') AS translated,
  replace(p_name, ' ', '-') AS dashed,
  substr(p_name, 3, 7) AS sliced,
  left(p_name, 4) AS l4,
  right(p_name, 4) AS r4,
  CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
  repeat(left(p_name, 2), 3) AS rep,
  reverse(p_name) AS rev,
  CAST(length(p_name) AS BIGINT) AS len,
  CAST(ascii(p_name) AS BIGINT) AS first_code,
  concat_ws('|', 'p', p_name) AS joined
FROM part
"""

QUERIES.append(
    Query(
        "q66_string_fns",
        q66_string_fns_q,
        Q66_SQL,
        "16-function scalar string parity sweep, one codegen'd projection",
    )
)


def q67_datetime_fns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar-function parity sweep over order dates: parts,
    truncation, arithmetic, boundaries, epoch — the temporal half of
    §2.3's scalar row, value-exact across engines."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.quarter(d).cast("long").alias("q"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 90).alias("plus90"),
        F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_99"),
        F.unix_timestamp(d).cast("long").alias("epoch_s"),
    )


Q67_SQL = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS y,
  CAST(quarter(o_orderdate) AS BIGINT) AS q,
  CAST(month(o_orderdate) AS BIGINT) AS m,
  CAST(day(o_orderdate) AS BIGINT) AS dom,
  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
  date_trunc('month', o_orderdate) AS month_start,
  CAST(last_day(o_orderdate) AS DATE) AS month_end,
  CAST(o_orderdate AS DATE) + 90 AS plus90,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
       AS BIGINT) AS days_to_99,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
"""

QUERIES.append(
    Query(
        "q67_datetime_fns",
        q67_datetime_fns_q,
        Q67_SQL,
        "datetime scalar parity sweep: parts, trunc, arithmetic, epoch",
    )
)


def q68_profile_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (the ANALYZE/summarize shape): one
    wide aggregate computes nulls / exact distincts / min / max for
    every profiled column in ONE scan, then unpivots to the
    (column, metric...) long form. At 100 TB this is one pass over
    the table — never per-column scans — with partial aggregation
    doing the heavy lift map-side."""
    orders = read_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]
    wide = orders.agg(
        F.count("*").alias("_n"),
        *[
            a
            for c in cols
            for a in (
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"{c}__nulls"),
                F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
                F.min(F.col(c).cast("string")).alias(f"{c}__min"),
                F.max(F.col(c).cast("string")).alias(f"{c}__max"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.selectExpr(
        "_n as n_rows",
        f"stack({len(cols)}, {stack}) as "
        "(column_name, n_nulls, n_distinct, min_str, max_str)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


Q68_SQL = """
WITH w AS (
  SELECT COUNT(*) AS n,
    SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS s_nulls,
    COUNT(DISTINCT o_orderstatus) AS s_d,
    MIN(CAST(o_orderstatus AS VARCHAR)) AS s_min,
    MAX(CAST(o_orderstatus AS VARCHAR)) AS s_max,
    SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS p_nulls,
    COUNT(DISTINCT o_orderpriority) AS p_d,
    MIN(CAST(o_orderpriority AS VARCHAR)) AS p_min,
    MAX(CAST(o_orderpriority AS VARCHAR)) AS p_max,
    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nulls,
    COUNT(DISTINCT o_custkey) AS c_d,
    MIN(CAST(o_custkey AS VARCHAR)) AS c_min,
    MAX(CAST(o_custkey AS VARCHAR)) AS c_max,
    SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS t_nulls,
    COUNT(DISTINCT o_totalprice) AS t_d,
    MIN(CAST(o_totalprice AS VARCHAR)) AS t_min,
    MAX(CAST(o_totalprice AS VARCHAR)) AS t_max
  FROM orders
)
SELECT 'o_orderstatus' AS column_name, CAST(n AS BIGINT) AS n_rows,
       CAST(s_nulls AS BIGINT) AS n_nulls, CAST(s_d AS BIGINT) AS n_distinct,
       s_min AS min_str, s_max AS max_str FROM w
UNION ALL
SELECT 'o_orderpriority', CAST(n AS BIGINT), CAST(p_nulls AS BIGINT),
       CAST(p_d AS BIGINT), p_min, p_max FROM w
UNION ALL
SELECT 'o_custkey', CAST(n AS BIGINT), CAST(c_nulls AS BIGINT),
       CAST(c_d AS BIGINT), c_min, c_max FROM w
UNION ALL
SELECT 'o_totalprice', CAST(n AS BIGINT), CAST(t_nulls AS BIGINT),
       CAST(t_d AS BIGINT), t_min, t_max FROM w
"""

QUERIES.append(
    Query(
        "q68_profile_columns",
        q68_profile_columns_q,
        Q68_SQL,
        "one-scan column profiler (nulls/distinct/min/max) unpivoted to long form",
    )
)


def q69_fk_integrity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema in ONE lazy
    plan: orphan counts for every FK edge (child LEFT JOIN distinct
    parent keys, orphan = null probe — broadcast when the parent is a
    dim) plus child row counts, the data-quality gate a pipeline runs
    before trusting joins. Both lineitem edges share a single scan
    (one agg row unpivoted with stack). All counts exact; nothing
    executes until the caller acts."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")

    def parent_keys(parent, pk, fk):
        return parent.select(F.col(pk).alias(fk)).distinct().withColumn(
            f"_p_{fk}", F.lit(1)
        )

    def one_edge(child, fk, parent, pk, name):
        # child LEFT JOIN distinct parent keys; an orphan is a null
        # probe — one aggregate gives both counts, fully lazy
        return (
            child.select(fk)
            .join(parent_keys(parent, pk, fk), fk, "left")
            .agg(
                F.count("*").cast("long").alias("n_child"),
                F.sum(
                    F.when(F.col(f"_p_{fk}").isNull(), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )

    # both lineitem edges share ONE scan: join both parent key sets,
    # aggregate both orphan counts in one row, unpivot with stack
    li_audit = (
        li.select("l_orderkey", "l_suppkey")
        .join(parent_keys(orders, "o_orderkey", "l_orderkey"), "l_orderkey", "left")
        .join(parent_keys(supplier, "s_suppkey", "l_suppkey"), "l_suppkey", "left")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("_p_l_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("orph_o"),
            F.sum(F.when(F.col("_p_l_suppkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("orph_s"),
        )
        .selectExpr(
            "stack(2, 'lineitem->orders', n, orph_o, "
            "'lineitem->supplier', n, orph_s) "
            "AS (fk_edge, n_child, n_orphans)"
        )
    )
    return (
        one_edge(orders, "o_custkey", customer, "c_custkey", "orders->customer")
        .unionByName(li_audit)
        .unionByName(
            one_edge(
                customer, "c_nationkey", nation, "n_nationkey", "customer->nation"
            )
        )
    )


Q69_SQL = """
SELECT 'orders->customer' AS fk_edge,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""

QUERIES.append(
    Query(
        "q69_fk_integrity",
        q69_fk_integrity_q,
        Q69_SQL,
        "referential-integrity audit: orphan counts for every FK edge",
    )
)


def q70_k_anonymity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier: equivalence-class sizes with an at-risk flag
    for classes smaller than k=20 — the privacy gate run before
    releasing a dataset keyed on quasi-identifiers. One partial+final
    aggregate; the flag is an exact integer comparison."""
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "c_mktsegment",
        )
        .agg(F.count("*").cast("long").alias("class_size"))
        .select(
            "nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") < 20).alias("below_k"),
        )
    )


Q70_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       COUNT(*) < 20 AS below_k
FROM customer
GROUP BY 1, 2
"""

QUERIES.append(
    Query(
        "q70_k_anonymity",
        q70_k_anonymity_q,
        Q70_SQL,
        "k-anonymity equivalence-class audit over quasi-identifiers",
    )
)


def q71_filter_clause_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER (WHERE ...) aggregate modifiers in one shared SQL
    text — the standard's conditional-aggregation syntax (the planner
    lowers it to the same conditional-sum Expand the pivot uses):
    per-priority order counts split by status and a filtered exact
    distinct, one scan."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("q71_orders")
    return spark.sql(Q71_TEXT.format(t="q71_orders"))


Q71_TEXT = """
SELECT o_orderpriority,
  COUNT(*) AS n_all,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)
    AS big_spenders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value
FROM {t}
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q71_filter_clause",
        q71_filter_clause_q,
        Q71_TEXT.format(t="orders"),
        "ANSI FILTER (WHERE) aggregate modifiers, one shared SQL text",
    )
)


def q72_waiting_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's hard shape — the query that stresses a planner's
    correlated-EXISTS machinery: suppliers whose lineitem missed its
    ship cutoff on a multi-supplier order where EVERY other supplier
    shipped on time (EXISTS another supplier on the order, NOT EXISTS
    another late one; the synthetic lineitem has no
    receipt/commit dates, so "late" is a shipdate cutoff — the
    decorrelation shape is identical). Catalyst decorrelates both subqueries
    into a semi-join and an anti-join against the same lineitem scan;
    nothing is row-at-a-time. One shared SQL text runs on both
    engines."""
    for t in ("lineitem", "supplier"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"q72_{t}")
    return spark.sql(Q72_TEXT.format(l="q72_lineitem", s="q72_supplier"))


Q72_TEXT = """
SELECT s.s_name, COUNT(*) AS numwait
FROM {s} s
JOIN {l} l1 ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_shipdate > TIMESTAMP '1998-06-01'
  AND EXISTS (SELECT 1 FROM {l} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM {l} l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > TIMESTAMP '1998-06-01')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""

QUERIES.append(
    Query(
        "q72_waiting_suppliers",
        q72_waiting_suppliers_q,
        Q72_TEXT.format(l="lineitem", s="supplier"),
        "TPC-H Q21 shape: correlated EXISTS + NOT EXISTS decorrelated to semi/anti joins",
    )
)


def q73_group_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group order statistics: p50/p90/p99 order value per
    priority via percentile_disc (discrete — picks an actual row
    value, so it is engine-exact, unlike interpolating percentile_cont
    whose float blend depends on arithmetic order). One sort-based
    aggregate per group."""
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("q73_orders")
    return spark.sql(
        Q73_TEXT.format(t="q73_orders")
    )


Q73_TEXT = """
SELECT o_orderpriority,
  COUNT(*) AS n,
  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
  percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
  percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
FROM {t}
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q73_group_percentiles",
        q73_group_percentiles_q,
        Q73_TEXT.format(t="orders"),
        "exact per-group p50/p90/p99 via percentile_disc (order statistics)",
    )
)


# --- The classic TPC-H join-shape suite (Q7/Q8/Q9/Q10/Q15/Q17/Q18/Q19/Q22
# adapted to this star schema — no partsupp table, no
# shipmode/commitdate/phone columns; each docstring names the
# adaptation). Reference scope note: the reference engine has no
# relational surface (it is a 285-line CC script); these queries pin
# the engine's claim to the canonical warehouse join patterns. All
# money math follows the DEC discipline (decimal sums, one double cast
# at the end) so the cross-engine hash is stable. ---------------------


def q74_nation_volume_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, both
    directions, per ship year. Five joins; every dim side (supplier,
    customer, nation) is broadcast, so the only shuffle is
    lineitem->orders. The nation-pair predicate is applied AFTER the
    nation joins exactly like the spec (it needs both endpoints)."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("volume"))
    )


Q74_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""

QUERIES.append(
    Query(
        "q74_nation_volume",
        q74_nation_volume_q,
        Q74_SQL,
        "TPC-H Q7 shape: bidirectional nation-pair shipping volume per year",
    )
)


def q75_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' market share of STANDARD
    parts sold to ASIA customers, per order year. The share is a
    conditional-decimal-sum over total-decimal-sum, each cast to
    double before ONE IEEE division (both engines perform the same
    two exact sums and the same single division — hash-stable). Six
    joins; everything but lineitem->orders is broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_regionkey").alias("c_rk"),
    )
    base = (
        li.join(F.broadcast(part.where(F.col("p_type") == "STANDARD")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("c_rk"),
        )
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("vol"),
            F.col("supp_nation"),
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share"),
        F.sum("vol").cast("double").alias("total_volume"),
    )


Q75_SQL = """
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol,
    n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n2.n_regionkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share,
  CAST(SUM(vol) AS DOUBLE) AS total_volume
FROM base GROUP BY 1
"""

QUERIES.append(
    Query(
        "q75_market_share",
        q75_market_share_q,
        Q75_SQL,
        "TPC-H Q8 shape: one nation's market share of a part type in a region",
    )
)


def q76_product_profit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: net amount on '%widget%' parts by supplier
    nation and order year. Adaptation: no partsupp table, so cost is
    the tax side — net = extprice*(1-disc) - extprice*tax, all
    decimal until the final double cast. LIKE-filtered part dim is
    broadcast; lineitem->orders is the one shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    net = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    ) - F.col("l_extendedprice").cast(DEC) * F.col("l_tax").cast(DEC)
    return (
        li.join(
            F.broadcast(part.where(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(net).cast("double").alias("net_amount"))
    )


Q76_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
         - CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS net_amount
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""

QUERIES.append(
    Query(
        "q76_product_profit",
        q76_product_profit_q,
        Q76_SQL,
        "TPC-H Q9 shape: net amount on LIKE-matched parts by supplier nation/year",
    )
)


def q77_returned_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    (l_returnflag = 'R') over one order year. Filter-before-join on
    orders (pushdown), broadcast customer+nation; deterministic
    tiebreak on c_custkey."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1999-01-01"))
                & (F.col("o_orderdate") < F.lit("2000-01-01"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q77_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1999-01-01'
  AND o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

QUERIES.append(
    Query(
        "q77_returned_customers",
        q77_returned_customers_q,
        Q77_SQL,
        "TPC-H Q10 shape: top-20 customers by returned-line revenue in a year",
    )
)


def q78_top_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving MAX quarterly
    revenue — the view + scalar-subquery pattern. The per-supplier
    revenue aggregate is computed ONCE and localCheckpointed (it
    feeds both the max scalar and the equality filter; without the
    pin the two consumers would each rescan lineitem). Exact decimal
    equality against the max, so ties are all returned
    (deterministic set, ordered by s_suppkey)."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1999-01-01"))
            & (F.col("l_shipdate") < F.lit("1999-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(revenue).alias("total_rev"))
        .localCheckpoint(eager=True)
    )
    max_rev = rev.agg(F.max("total_rev")).collect()[0][0]
    return (
        supp.join(
            F.broadcast(rev.where(F.col("total_rev") == F.lit(max_rev))),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q78_SQL = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '1999-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
"""

QUERIES.append(
    Query(
        "q78_top_supplier",
        q78_top_supplier_q,
        Q78_SQL,
        "TPC-H Q15 shape: supplier(s) at max quarterly revenue (view + scalar max)",
    )
)


def q79_small_qty_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue that would be lost by refusing
    small-quantity orders of Brand#1 parts. The correlated per-part
    average is a broadcast groupBy-join, and the sub-average predicate
    is EXACT cross-multiplication — qty < 0.2*(S/n) is evaluated as
    5*qty*n < S in decimal/int64, never via a float average whose
    summation order could differ between engines. Single-row result:
    qualifying line count + decimal sum / 7 (one double division)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"),
        F.count("*").alias("qty_n"),
    )
    return (
        li.join(
            F.broadcast(part.where(F.col("p_brand") == "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("pk") == F.col("l_partkey"))
        .where(
            F.col("l_quantity").cast(DEC) * F.col("qty_n") * 5
            < F.col("qty_sum")
        )
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
        )
    )


Q79_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
    COUNT(*) AS qty_n
  FROM lineitem GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN per_part ON pk = l_partkey
WHERE p_brand = 'Brand#1'
  AND CAST(l_quantity AS DECIMAL(18,2)) * qty_n * 5 < qty_sum
"""

QUERIES.append(
    Query(
        "q79_small_qty_revenue",
        q79_small_qty_revenue_q,
        Q79_SQL,
        "TPC-H Q17 shape: small-quantity revenue, correlated avg via exact cross-mult",
    )
)


def q80_big_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — orders whose total line
    quantity exceeds 180, with their customer, ranked by price. The
    HAVING-on-sum is a partial+final aggregate on the FK; broadcast
    customer; deterministic o_orderkey tiebreak."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > 180)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


Q80_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1, 2, 3, 4, 5
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""

QUERIES.append(
    Query(
        "q80_big_orders",
        q80_big_orders_q,
        Q80_SQL,
        "TPC-H Q18 shape: orders above a total-quantity threshold, top by price",
    )
)


def q81_brand_quantity_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    bands — the disjunctive-predicate pushdown pattern (the brand and
    size conjuncts reach the broadcast part side; the OR across bands
    is evaluated post-join). Single row: decimal revenue + line
    count."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & (F.col("l_quantity") >= 15)
        & (F.col("l_quantity") <= 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & (F.col("l_quantity") >= 25)
        & (F.col("l_quantity") <= 45)
    )
    return (
        li.join(
            F.broadcast(
                part.where(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .where(band)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


Q81_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 15 AND l_quantity <= 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 25 AND l_quantity <= 45)
"""

QUERIES.append(
    Query(
        "q81_brand_quantity_bands",
        q81_brand_quantity_bands_q,
        Q81_SQL,
        "TPC-H Q19 shape: OR of brand/size/quantity bands, disjunctive pushdown",
    )
)


def q82_idle_wealthy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers gone idle — above the
    average positive account balance AND no orders in the final data
    year (adaptation: no c_phone country codes in this schema; the
    recency anti-join stands in for 'never ordered', which is empty
    here because every customer has history). The global average is
    exact cross-multiplication (bal * n > S in decimal/int64), the
    no-recent-orders test is a left-anti join, and the result is
    per-nation count + decimal balance sum."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("s"),
        F.count("*").alias("n"),
    )
    srow = pos.collect()[0]
    bal_sum, bal_n = srow["s"], srow["n"]
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    ).select(F.col("o_custkey").alias("ck"))
    return (
        cust.where(F.col("c_acctbal").cast(DEC) * F.lit(bal_n) > F.lit(bal_sum))
        .join(recent, F.col("ck") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )


Q82_SQL = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_cust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT n FROM pos) > (SELECT s FROM pos)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
  )
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q82_idle_wealthy",
        q82_idle_wealthy_q,
        Q82_SQL,
        "TPC-H Q22 shape: above-average balances with no recent orders, per nation",
    )
)


def q83_custdist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers — the left-join-then-count-child
    pattern (count(o_orderkey), which skips nulls, not count(*)).
    Orders with '1-URGENT' priority are excluded inside the join
    condition, exactly the spec's not-like exclusion seat. Two
    aggregates: per-customer count, then the histogram."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("long").alias("c_count"))
        .agg(F.count("*").cast("long").alias("custdist"))
    )


Q83_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY 1
"""

QUERIES.append(
    Query(
        "q83_custdist",
        q83_custdist_q,
        Q83_SQL,
        "TPC-H Q13 shape: customer-by-order-count histogram incl. zero bucket",
    )
)


def q84_ship_delay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted (no l_shipmode/commitdate in this
    schema): per order priority, how many lineitems shipped more than
    60 days after the order date — the conditional-count-over-join
    pattern. datediff on midnight timestamps is an exact integer in
    both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("late_lines"),
            F.count("*").cast("long").alias("total_lines"),
        )
    )


Q84_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
  CAST(COUNT(*) AS BIGINT) AS total_lines
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q84_ship_delay",
        q84_ship_delay_q,
        Q84_SQL,
        "TPC-H Q12 shape: late-shipment counts per order priority",
    )
)


def q85_heavy_widget_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted (no partsupp): suppliers whose shipped
    quantity of '%widget%' parts exceeds HALF the max per-supplier
    widget quantity — the nested-aggregate-threshold pattern. The
    per-supplier aggregate is pinned once (it feeds the max scalar
    AND the filter); the threshold comparison is exact decimal
    cross-multiplication (qty*2 > max), no division."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    wq = (
        li.join(
            F.broadcast(part.where(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .localCheckpoint(eager=True)
    )
    max_qty = wq.agg(F.max("qty")).collect()[0][0]
    return (
        supp.join(
            F.broadcast(wq.where(F.col("qty") * 2 > F.lit(max_qty))),
            F.col("sk") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("qty").cast("double").alias("widget_qty"),
        )
    )


Q85_SQL = """
WITH wq AS (
  SELECT l_suppkey AS sk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%widget%'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(qty AS DOUBLE) AS widget_qty
FROM supplier JOIN wq ON sk = s_suppkey
WHERE qty * 2 > (SELECT MAX(qty) FROM wq)
"""

QUERIES.append(
    Query(
        "q85_heavy_widget_suppliers",
        q85_heavy_widget_suppliers_q,
        Q85_SQL,
        "TPC-H Q20 shape: suppliers above half the max widget quantity",
    )
)


def q86_winsorized_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized order-price statistics: clamp to the exact
    p01/p99 order values (percentile_disc picks REAL data points —
    engine-exact, unlike interpolating percentile_cont) and report
    the robust mean beside the clamp counts — the outlier-resistant
    summary a pricing dashboard shows. The two boundaries are ONE
    aggregate row cross-joined back lazily (broadcast, no collect);
    the clamped sum runs in decimal and casts to double once, and the
    mean is a single IEEE division."""
    orders = read_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.expr(
            "percentile_disc(0.01) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    clamped = F.greatest(
        F.least(F.col("o_totalprice"), F.col("hi")), F.col("lo")
    ).cast(DEC)
    return (
        orders.crossJoin(F.broadcast(bounds))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
            F.sum(clamped).alias("_ws"),
        )
        .select(
            "n",
            "n_clamped_low",
            "n_clamped_high",
            F.col("_ws").cast("double").alias("wins_sum"),
            (F.col("_ws").cast("double") / F.col("n").cast("double")).alias(
                "wins_mean"
            ),
        )
    )


Q86_SQL = """
WITH bounds AS (
  SELECT
    percentile_disc(0.01) WITHIN GROUP (ORDER BY o_totalprice) AS lo,
    percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS hi
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clamped_low,
  CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clamped_high,
  CAST(SUM(CAST(GREATEST(LEAST(o_totalprice, hi), lo) AS DECIMAL(18,2))) AS DOUBLE)
    AS wins_sum,
  CAST(SUM(CAST(GREATEST(LEAST(o_totalprice, hi), lo) AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS wins_mean
FROM orders CROSS JOIN bounds
"""

QUERIES.append(
    Query(
        "q86_winsorized_stats",
        q86_winsorized_stats_q,
        Q86_SQL,
        "winsorized mean at exact p01/p99 boundaries with clamp counts",
    )
)


def q89_equidepth_hist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order prices: bin boundaries
    are the exact percentile_disc deciles (real data values,
    engine-exact), bin id = count of boundaries strictly below the
    value, per-bin count + decimal sum. The equi-depth sketch is what
    an optimizer's column statistics actually store; computed here
    with ONE boundary-aggregate row broadcast back lazily (no
    collect) + one partial/final agg over the assignment."""
    orders = read_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        *[
            F.expr(
                f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias(f"b{i}")
            for i in range(1, 10)
        ]
    )
    bin_id = (
        sum(
            F.when(F.col("o_totalprice") > F.col(f"b{i}"), 1).otherwise(0)
            for i in range(1, 10)
        )
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias(
                "bin_sum"
            ),
        )
    )


Q89_SQL = """
WITH bounds AS (
  SELECT
    percentile_disc(0.1) WITHIN GROUP (ORDER BY o_totalprice) AS b1,
    percentile_disc(0.2) WITHIN GROUP (ORDER BY o_totalprice) AS b2,
    percentile_disc(0.3) WITHIN GROUP (ORDER BY o_totalprice) AS b3,
    percentile_disc(0.4) WITHIN GROUP (ORDER BY o_totalprice) AS b4,
    percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS b5,
    percentile_disc(0.6) WITHIN GROUP (ORDER BY o_totalprice) AS b6,
    percentile_disc(0.7) WITHIN GROUP (ORDER BY o_totalprice) AS b7,
    percentile_disc(0.8) WITHIN GROUP (ORDER BY o_totalprice) AS b8,
    percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS b9
  FROM orders
)
SELECT CAST(
    (CASE WHEN o_totalprice > b1 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b2 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b3 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b4 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b5 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b6 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b7 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b8 THEN 1 ELSE 0 END)
  + (CASE WHEN o_totalprice > b9 THEN 1 ELSE 0 END) AS BIGINT) AS bin_id,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_sum
FROM orders CROSS JOIN bounds
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q89_equidepth_hist",
        q89_equidepth_hist_q,
        Q89_SQL,
        "equi-depth decile histogram at exact percentile_disc boundaries",
    )
)


def er_cluster_entities_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution END TO END: blocked fuzzy candidate pairs
    (first-token block, Levenshtein <= 2 — the q64 scale-true shape)
    feed the engine's own connected-components loop, and each entity
    gets its cluster's canonical id (min key) + cluster size — the
    complete dedup-entities pipeline (blocking -> similarity ->
    transitive closure -> canonicalization) in one composition.
    Entities are every 5th part; keys ride zero-padded strings so
    CC's lexicographic min IS the numeric min. CC is exact (the same
    fixed point the flagship gates), pairs are exact integers, so
    the whole pipeline is hash-gated against a recursive-CTE oracle."""
    from map_reduce_project_spark.graph.ccf import connected_components

    part = read_table(spark, sf_dir, "part").where(
        F.col("p_partkey") % 5 == 0
    )
    ent = part.select(
        F.lpad(F.col("p_partkey").cast("string"), 9, "0").alias("k"),
        "p_name",
        F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
    )
    pairs = (
        ent.alias("a")
        .join(ent.alias("b"), "blk")
        .where(F.col("a.k") < F.col("b.k"))
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"))
    )
    mapping = connected_components(pairs).mapping
    clustered = ent.join(
        mapping.withColumnRenamed("node", "k"), "k", "left"
    ).select(
        "k",
        "p_name",
        F.coalesce(F.col("component"), F.col("k")).alias("canon"),
    )
    sizes = clustered.groupBy("canon").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return clustered.join(sizes, "canon").select(
        F.col("k").cast("long").alias("p_partkey"),
        "p_name",
        F.col("canon").cast("long").alias("canonical_key"),
        "cluster_size",
    )


ER_CLUSTER_SQL = """
WITH RECURSIVE ent AS (
  SELECT lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS k, p_name,
         split_part(p_name, ' ', 1) AS blk
  FROM part WHERE p_partkey % 5 = 0
), e AS (
  SELECT a.k AS src, b.k AS dst
  FROM ent a JOIN ent b ON a.blk = b.blk AND a.k < b.k
  WHERE levenshtein(a.p_name, b.p_name) <= 2
), und AS (
  SELECT src, dst FROM e UNION SELECT dst, src FROM e
), nodes AS (
  SELECT DISTINCT src AS n FROM und
), und2 AS (
  SELECT src, dst FROM und UNION SELECT n, n FROM nodes
), lab AS (
  SELECT 0 AS it, n AS node, n AS lab FROM nodes
  UNION ALL
  SELECT lab.it + 1 AS it, und2.dst AS node, MIN(lab.lab) AS lab
  FROM lab JOIN und2 ON und2.src = lab.node
  WHERE lab.it < 30
  GROUP BY lab.it, und2.dst
), final AS (
  SELECT node, lab FROM lab WHERE it = 30
), clustered AS (
  SELECT ent.k, ent.p_name, COALESCE(f.lab, ent.k) AS canon
  FROM ent LEFT JOIN final f ON f.node = ent.k
)
SELECT CAST(c.k AS BIGINT) AS p_partkey, c.p_name,
       CAST(c.canon AS BIGINT) AS canonical_key,
       CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM clustered c
JOIN (SELECT canon, COUNT(*) AS cluster_size FROM clustered GROUP BY 1) s
  ON s.canon = c.canon
"""

QUERIES.append(
    Query(
        "er_cluster_entities",
        er_cluster_entities_q,
        ER_CLUSTER_SQL,
        "ER end-to-end: blocked fuzzy pairs -> CC closure -> canonical clusters",
    )
)


def q90_running_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT customers per order month WITHOUT a
    stateful distinct-over-window (which Spark cannot express and a
    warehouse cannot afford): a customer contributes to the running
    count from their FIRST order month onward, so the answer is a
    cumulative sum over first-appearance counts — the standard
    min-first-appearance rewrite that turns an O(n*months) distinct
    state into two aggregates and a 10-row window."""
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("first_m")
    )
    per_month = firsts.groupBy(F.col("first_m").alias("month")).agg(
        F.count("*").cast("long").alias("new_customers")
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_month.select(
        "month",
        "new_customers",
        F.sum("new_customers").over(w).cast("long").alias(
            "cum_distinct_customers"
        ),
    )


Q90_SQL = """
WITH firsts AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS first_m
  FROM orders GROUP BY 1
),
per_month AS (
  SELECT first_m AS month, CAST(COUNT(*) AS BIGINT) AS new_customers
  FROM firsts GROUP BY 1
)
SELECT month, new_customers,
  CAST(SUM(new_customers) OVER (ORDER BY month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_distinct_customers
FROM per_month
"""

QUERIES.append(
    Query(
        "q90_running_distinct",
        q90_running_distinct_q,
        Q90_SQL,
        "cumulative distinct customers via the first-appearance rewrite",
    )
)


def q91_order_gap_hist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-customer inter-order gaps (days between
    consecutive orders, log2-binned): the repeat-purchase cadence
    profile. LAG per customer (partitioned window — never global),
    integer datediff, power-of-two bins via the bit length of the
    gap — all exact."""
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev", F.lag("o_orderdate").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            F.datediff(F.col("o_orderdate"), F.col("prev")).alias("gap")
        )
    )
    # log2 bin: 0 for gap 0, else floor(log2(gap)) + 1 computed via
    # string length of the binary representation (exact integer)
    bin_id = F.when(F.col("gap") <= 0, 0).otherwise(
        F.length(F.conv(F.col("gap").cast("string"), 10, 2))
    )
    return (
        gaps.groupBy(bin_id.cast("long").alias("gap_bin"))
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap"),
            F.max("gap").cast("long").alias("max_gap"),
        )
    )


Q91_SQL = """
WITH gaps AS (
  SELECT date_diff('day',
           LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap
  FROM orders
)
SELECT CAST(CASE WHEN gap <= 0 THEN 0
            ELSE LENGTH(to_binary_repr) END AS BIGINT) AS gap_bin,
  CAST(COUNT(*) AS BIGINT) AS n_gaps,
  CAST(MIN(gap) AS BIGINT) AS min_gap,
  CAST(MAX(gap) AS BIGINT) AS max_gap
FROM (SELECT gap, bin(gap::UBIGINT) AS to_binary_repr FROM gaps
      WHERE gap IS NOT NULL)
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q91_order_gap_hist",
        q91_order_gap_hist_q,
        Q91_SQL,
        "log2-binned inter-order gap histogram per customer cadence",
    )
)


def q93_l_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's complement (q70): a class can
    be large yet still leak if everyone in it shares the same
    SENSITIVE value. Per (nation, market-segment) equivalence class:
    the count of distinct sensitive values (account-balance band) and
    a below-l flag at l=3. Exact distinct over a 3-valued derived
    category; one partial+final aggregate."""
    cust = read_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        cust.select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "c_mktsegment",
            band.alias("band"),
        )
        .groupBy("nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("class_size"),
            F.count_distinct("band").cast("long").alias("n_sensitive"),
        )
        .select(
            "nationkey",
            "c_mktsegment",
            "class_size",
            "n_sensitive",
            (F.col("n_sensitive") < 3).alias("below_l"),
        )
    )


Q93_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS class_size,
  CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'debt'
                           WHEN c_acctbal < 5000 THEN 'low'
                           ELSE 'high' END) AS BIGINT) AS n_sensitive,
  COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'debt'
                      WHEN c_acctbal < 5000 THEN 'low'
                      ELSE 'high' END) < 3 AS below_l
FROM customer
GROUP BY 1, 2
"""

QUERIES.append(
    Query(
        "q93_l_diversity",
        q93_l_diversity_q,
        Q93_SQL,
        "l-diversity audit: distinct sensitive values per quasi-identifier class",
    )
)
