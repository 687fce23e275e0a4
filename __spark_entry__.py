"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``map_reduce_project_spark.queries`` — each is
defined once as a (Spark implementation, DuckDB oracle SQL) pair so
column aliases cannot drift between the two sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from map_reduce_project_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CCF connected
    components over the customer-order bipartite graph (the
    reference's core algorithm, DataFrame-native)."""
    from map_reduce_project_spark.queries.graph_queries import (
        cc_orders_bipartite,
    )

    return cc_orders_bipartite(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each hash-checkable query; genuinely
    non-SQL-expressible ops (multi-iteration connected components,
    streaming) are omitted → rows-only check."""
    return {
        name: q.oracle
        for name, q in all_queries().items()
        if q.oracle is not None
    }
