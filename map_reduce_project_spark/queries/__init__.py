"""Query registry: every operator exposed by the engine, wired to the
driver's star-schema tables, each with its DuckDB oracle SQL twin.

A ``Query`` couples the Spark implementation and the ANSI-SQL oracle in
one place so column aliases can never drift apart (the driver's
correctness gate hashes values under sorted column names).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    description: str = ""


def _row_is_green(row: dict) -> bool:
    """A driver CORRECTNESS row counts as evidence iff it carries no
    error, its value-hash did not mismatch, and at least one of the
    hash/row checks affirmatively passed (rows-only checks have no
    oracle hash)."""
    return (
        row.get("err") is None
        and row.get("hash_match") is not False
        and (row.get("hash_match") is True or row.get("rows_match") is True)
    )


def evidence_counts() -> dict[str, int]:
    """Rounds of driver-green CORRECTNESS evidence per query name.

    Primary source: the ``CORRECTNESS_r*.json`` files the driver
    commits at the repo root each round — parsing them at
    registry-build time means every newly added query automatically
    has zero evidence and leads the registry, so the correctness
    window can never silently miss a round's own additions (the
    failure the round-5 and round-6 judges both flagged in the
    hand-maintained priority list). Fallback when the package is
    imported away from the repo checkout: the committed
    ``evidence_ledger.json`` snapshot (regenerate with
    ``tools/build_evidence_ledger.py``).
    """
    root = Path(__file__).resolve().parents[2]
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    counts: dict[str, int] = {}
    if files:
        for f in files:
            try:
                rows = json.loads(f.read_text())
            except (OSError, ValueError):
                continue
            if not isinstance(rows, dict):
                continue  # malformed driver file -> zero evidence, not a crash
            for name, row in rows.items():
                if isinstance(row, dict) and _row_is_green(row):
                    counts[name] = counts.get(name, 0) + 1
        return counts
    packaged = Path(__file__).with_name("evidence_ledger.json")
    try:
        ledger = json.loads(packaged.read_text())
    except (OSError, ValueError):
        return {}
    return {name: len(rounds) for name, rounds in ledger.items()}


def all_queries() -> dict[str, Query]:
    from map_reduce_project_spark.queries import (
        advanced,
        capstone,
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

    by_name: dict[str, Query] = {}
    reg_index: dict[str, int] = {}
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
        capstone,
    ):
        for q in mod.QUERIES:
            if q.name in by_name:
                raise ValueError(f"duplicate query name: {q.name}")
            reg_index[q.name] = len(by_name)
            by_name[q.name] = q

    # The driver's correctness gate checks the FIRST 50 registry
    # entries per round. Ordering is DERIVED, not hand-maintained:
    # ascending rounds of driver-green CORRECTNESS evidence, ties
    # broken newest-registration-first. A query added this round has
    # zero evidence and therefore leads the registry automatically —
    # the structural fix for the recurring round-5/round-6 finding
    # that a hand-curated list loses each round's own additions
    # behind ~290 already-green entries. Environment-gated queries
    # (e.g. ev_sessions_tws, registered only where protobuf exists)
    # need no special casing: when present they have zero evidence
    # and lead like any other new query.
    counts = evidence_counts()
    priority = sorted(
        by_name, key=lambda n: (counts.get(n, 0), -reg_index[n])
    )
    return {n: by_name[n] for n in priority}


__all__ = ["Query", "all_queries", "evidence_counts"]
