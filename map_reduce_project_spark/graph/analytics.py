"""Graph analytics beyond connected components: triangle counting.

Implements the degree-ordered triangle count (Suri & Vassilvitskii,
WWW 2011 — the MapReduce formulation; also Cohen 2009): orient every
undirected edge from its lower-(degree, id) endpoint to the higher
one, then count wedges closed by an oriented edge. Degree ordering is
the scale trick: a hub of degree d contributes O(d^2) wedges under
naive orientation but only O(sum of squared OUT-degrees) here, and
out-degree is bounded by ~sqrt(edges) under this orientation — the
difference between feasible and quadratic on power-law graphs.

The count is orientation-invariant (every triangle has exactly one
source under any total order), which is what lets the DuckDB oracle
use plain id-ordering while the engine uses degree-ordering.

Physical shape: one degree aggregate, two equi-joins (wedge build +
closure semi-join), all shuffle-partitioned on node ids — no
windows, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ccf import _undirected


def degree_oriented_edges(edges: DataFrame) -> DataFrame:
    """Canonical (src -> dst) orientation by (degree, id) order, with
    self-loops and duplicate edges removed. Output: (src, dst)."""
    canon = (
        edges.select(
            F.least(edges.columns[0], edges.columns[1]).alias("a"),
            F.greatest(edges.columns[0], edges.columns[1]).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    und = _undirected(canon.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    deg = und.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "n")

    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = canon.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Single-row DataFrame (n_nodes, n_edges, n_triangles) for the
    undirected simple graph induced by ``edges``."""
    oriented = degree_oriented_edges(edges)

    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "v").select("u", "v", "w")
    # the orientation is a total order, so a wedge u->v->w can only be
    # closed by the oriented edge (u, w) — one semi-join, no union
    closing = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["u", "w"], "left_semi")

    und = _undirected(oriented)
    return (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(
            oriented.agg(F.count("*").alias("n_edges"))
        )
        .crossJoin(
            und.select("src").distinct().agg(F.count("*").alias("n_nodes"))
        )
        .select("n_nodes", "n_edges", "n_triangles")
    )
