"""Physical-plan inspection: make the Catalyst plan a testable artifact.

The scale contract of this engine is not just "right answers" but
"right plans": filters reach the parquet scan, projections prune the
read schema, small dimensions broadcast, hot paths stay inside
whole-stage codegen, and shuffles appear only where the query
semantics require one. The reference has no optimizer to inspect
(its RDD lineage IS the physical plan — reference report.md:20); in
the rebuild, Catalyst's plan is an object we can assert on, and
tests/test_plans.py pins the plan shapes of the headline queries so a
regression that silently de-optimizes a query (e.g. a cast that kills
pushdown) fails CI rather than only showing up at 100 TB.

All helpers work on the FORMATTED explain output, which is a stable
public surface (df.explain("formatted")).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain output as a string (public API capture)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every file scan (column pruning
    evidence: a scan reading columns the query never touches is a
    pruning failure)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names read by all file scans."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        inner = schema[len("struct<"):].rstrip(">")
        for field in _split_top_level(inner):
            name = field.split(":", 1)[0].strip()
            if name:
                cols.add(name)
    return cols


def _split_top_level(s: str) -> list[str]:
    """Split struct field list on commas not nested in <> brackets."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Count of each physical operator in the formatted plan tree
    (keys like 'Exchange', 'BroadcastHashJoin', 'SortMergeJoin',
    'HashAggregate', 'WholeStageCodegen')."""
    plan = formatted_plan(df)
    counts: dict[str, int] = {}
    for m in re.finditer(r"^\(\d+\)\s+(\w+)", plan, re.MULTILINE):
        op = m.group(1)
        counts[op] = counts.get(op, 0) + 1
    # WholeStageCodegen spans are annotated on the op line, not listed
    counts["WholeStageCodegen"] = len(
        set(re.findall(r"\[codegen id : (\d+)\]", plan))
    )
    return counts


def num_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan — THE scale-review number: each
    one is a full network+disk pass over its input at cluster scale.
    Broadcast exchanges are excluded (they ship only the small side).
    Counted from the simple-mode plan, where shuffles print as
    'Exchange hashpartitioning(...)' / 'Exchange rangepartitioning'
    / 'Exchange SinglePartition'."""
    plan = simple_plan(df)
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_fraction(df: DataFrame) -> float:
    """Fraction of physical operators inside whole-stage codegen —
    the 'stay JVM-side' metric. Python row UDFs, explodes wrapped in
    non-codegen ops, and interpreted projections lower it."""
    plan = formatted_plan(df)
    op_lines = re.findall(r"^\(\d+\)\s+.*$", plan, re.MULTILINE)
    if not op_lines:
        return 0.0
    in_codegen = [ln for ln in op_lines if "[codegen id :" in ln]
    return len(in_codegen) / len(op_lines)
