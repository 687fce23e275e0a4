"""Graph queries: the reference's flagship CCF connected components,
bound to the driver's star schema.

cc_orders_bipartite has an exact SQL oracle because a customer-order
bipartite graph's components are trivially known (each order's only
neighbor is its customer, and "c:" < "o:" makes customers the
lexicographic representatives). cc_part_supplier exercises the real
multi-iteration fixed point on a co-occurrence graph; its correctness
is pinned by union-find property tests (tests/test_ccf.py), and the
driver records a rows-only check (connected components is not
expressible in portable non-recursive SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.graph.ccf import (
    component_summary,
    connected_components,
)
from map_reduce_project_spark.graph.analytics import triangle_count
from map_reduce_project_spark.graph.star import connected_components_star
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table


def _order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("dst"),
    )


def cc_orders_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCF over the customer-order bipartite graph (flagship, O2-O9)."""
    return connected_components(_order_edges(spark, sf_dir)).mapping


CC_ORDERS_SQL = """
SELECT 'o:' || o_orderkey AS node, 'c:' || o_custkey AS component
FROM orders
"""


def cc_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component membership summary (O11) over the flagship mapping."""
    mapping = connected_components(_order_edges(spark, sf_dir)).mapping
    return component_summary(mapping)


CC_SUMMARY_SQL = """
SELECT 'c:' || o_custkey AS component,
       list_sort(list_append(list('o:' || o_orderkey), 'c:' || o_custkey)) AS members,
       COUNT(*) + 1 AS size
FROM orders
GROUP BY o_custkey
"""


def cc_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCF over the part-supplier co-occurrence graph from lineitem.

    A real multi-iteration fixed point: parts sharing a supplier and
    suppliers sharing a part collapse into components. Rows-only driver
    check; semantics pinned by the union-find property tests.
    """
    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
    ).dropDuplicates()
    return connected_components(edges).mapping


def cc_star_orders_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al., SoCC 2014)
    over the same bipartite graph — the O(log n)-round scale-path
    alternative to CCF's O(diameter) loop (graph/star.py). Produces
    the identical (node, component) mapping, so it shares CCF's exact
    SQL oracle."""
    return connected_components_star(_order_edges(spark, sf_dir)).mapping


def cc_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size distribution of the flagship graph (O10/O11 agg)."""
    mapping = connected_components(_order_edges(spark, sf_dir)).mapping
    return (
        mapping.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .groupBy("n_members")
        .agg(F.count("*").alias("n_components"))
    )


CC_SIZES_SQL = """
SELECT n_members, COUNT(*) AS n_components FROM (
  SELECT o_custkey, COUNT(*) AS n_members FROM orders GROUP BY o_custkey
) GROUP BY n_members
"""


def cc_triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (parts appearing in the
    same order). The engine counts with DEGREE ordering (hub-safe at
    scale, graph/analytics.py); the oracle counts with plain id
    ordering — the count is orientation-invariant, so they must agree
    exactly."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = (
        li.select("l_orderkey", "l_partkey")
        .dropDuplicates()
        .alias("x")
        .join(
            li.select("l_orderkey", "l_partkey").dropDuplicates().alias("y"),
            "l_orderkey",
        )
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").cast("string").alias("src"),
            F.col("y.l_partkey").cast("string").alias("dst"),
        )
    )
    return triangle_count(edges)


CC_TRIANGLES_SQL = """
WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM ip x JOIN ip y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
),
nodes AS (SELECT a AS n FROM e UNION SELECT b FROM e)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*)
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
"""


QUERIES = [
    Query("cc_orders_bipartite", cc_orders_bipartite, CC_ORDERS_SQL, "CCF fixed point, bipartite flagship (exact oracle)"),
    Query("cc_orders_summary", cc_orders_summary, CC_SUMMARY_SQL, "component membership summary w/ representative re-add"),
    Query("cc_part_supplier", cc_part_supplier, None, "CCF multi-iteration co-occurrence graph (rows-only)"),
    Query("cc_star_orders_bipartite", cc_star_orders_bipartite, CC_ORDERS_SQL, "large-star/small-star CC, O(log n) rounds (exact oracle)"),
    Query("cc_triangles", cc_triangles_q, CC_TRIANGLES_SQL, "degree-ordered triangle count of the co-purchase graph"),
    Query("cc_component_sizes", cc_component_sizes, CC_SIZES_SQL, "component size histogram"),
]
