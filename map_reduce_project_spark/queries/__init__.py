"""Query registry: every operator exposed by the engine, wired to the
driver's star-schema tables, each with its DuckDB oracle SQL twin.

A ``Query`` couples the Spark implementation and the ANSI-SQL oracle in
one place so column aliases can never drift apart (the driver's
correctness gate hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    description: str = ""


def all_queries() -> dict[str, Query]:
    from map_reduce_project_spark.queries import (
        advanced,
        dedup,
        events,
        graph_queries,
        multimodal,
        pipeline,
        relational,
        similarity,
        temporal,
        text,
    )

    registry: dict[str, Query] = {}
    for mod in (
        relational,
        graph_queries,
        dedup,
        similarity,
        text,
        events,
        multimodal,
        advanced,
        temporal,
        pipeline,
    ):
        for q in mod.QUERIES:
            if q.name in registry:
                raise ValueError(f"duplicate query name: {q.name}")
            registry[q.name] = q
    return registry


__all__ = ["Query", "all_queries"]
