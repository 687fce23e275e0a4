"""Experiment sweep harness — the reference's benchmark surface
(reference ccf_experiments.py:146-260, H5/H6 in SURVEY.md §2.2).

Runs the same 34-config sweep (12 random + 10 chain + 12 cluster,
seed=42, Basic + SecondarySort) and writes the same 9-column CSV, so a
user of the reference can run their existing experiment workflow
unchanged:

    python -m map_reduce_project_spark.graph.experiments out.csv

Iteration counts match the reference's published Python results
bit-for-bit (experiment_results.csv) because the generators reproduce
its RNG call order exactly.
"""

from __future__ import annotations

import csv
import sys
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

from map_reduce_project_spark.graph.ccf import (
    component_count,
    connected_components,
)
from map_reduce_project_spark.graph.generators import (
    edges_df,
    generate_chain_graph,
    generate_cluster_graph,
    generate_cluster_graph_scala,
    generate_random_graph,
    generate_random_graph_scala,
)

CSV_FIELDS = [
    "experiment",
    "nodes",
    "edges",
    "algorithm",
    "iterations",
    "runtime_sec",
    "components",
    "clusters",
    "inter_edges",
]

# the reference's exact sweep configs (ccf_experiments.py:161-168,194,220-227)
RANDOM_CONFIGS = [
    (50, 100),
    (100, 300),
    (500, 1500),
    (1000, 3000),
    (2000, 6000),
    (5000, 15000),
]
CHAIN_CONFIGS = [10, 50, 100, 200, 500]
CLUSTER_CONFIGS = [
    (5, 20, 0),
    (5, 20, 4),
    (10, 50, 0),
    (10, 50, 9),
    (20, 50, 0),
    (20, 50, 19),
]


def _run(
    spark: SparkSession,
    experiment: str,
    edges: list[tuple[str, str]],
    n_nodes: int,
    use_secondary_sort: bool,
    clusters: int | None = None,
    inter_edges: int | None = None,
) -> dict:
    t0 = time.perf_counter()
    # reference sweep graphs are <= 50k edges: the local fast path
    # applies (identical iteration counts — the sweep goldens pin it)
    result = connected_components(
        edges_df(spark, edges),
        use_secondary_sort=use_secondary_sort,
        local_threshold=100_000,
    )
    n_components = component_count(result.mapping)
    runtime = time.perf_counter() - t0
    return {
        "experiment": experiment,
        "nodes": n_nodes,
        "edges": len(edges),
        "algorithm": "SecondarySort" if use_secondary_sort else "Basic",
        "iterations": result.iterations,
        "runtime_sec": round(runtime, 2),
        "components": n_components,
        "clusters": clusters if clusters is not None else "",
        "inter_edges": inter_edges if inter_edges is not None else "",
    }


def run_sweep(
    spark: SparkSession,
    progress: Callable[[str], None] | None = None,
    scala_rng: bool = False,
) -> list[dict]:
    """All 34 reference configs x both variants.

    ``scala_rng=True`` regenerates the reference's SECOND published
    result set (experiment_results_scala.csv): same configs, but edge
    sets drawn with the bit-exact java.util.Random reimplementation —
    iteration/component parity pinned by tests/test_scala_rng.py.
    """
    say = progress or (lambda s: None)
    gen_random = generate_random_graph_scala if scala_rng else generate_random_graph
    gen_cluster = generate_cluster_graph_scala if scala_rng else generate_cluster_graph
    rows: list[dict] = []
    for n_nodes, n_edges in RANDOM_CONFIGS:
        edges = gen_random(n_nodes, n_edges, seed=42)
        for sec in (False, True):
            rows.append(_run(spark, "random_graph", edges, n_nodes, sec))
            say(f"random {n_nodes}/{n_edges} sec={sec}: {rows[-1]['iterations']} iters")
    for n in CHAIN_CONFIGS:
        edges = generate_chain_graph(n)
        for sec in (False, True):
            rows.append(_run(spark, "chain_graph", edges, n, sec))
            say(f"chain {n} sec={sec}: {rows[-1]['iterations']} iters")
    for n_clusters, per, inter in CLUSTER_CONFIGS:
        edges = gen_cluster(n_clusters, per, inter, seed=42)
        for sec in (False, True):
            rows.append(
                _run(
                    spark,
                    "cluster_graph",
                    edges,
                    n_clusters * per,
                    sec,
                    clusters=n_clusters,
                    inter_edges=inter,
                )
            )
            say(f"cluster {n_clusters}x{per}+{inter} sec={sec}: {rows[-1]['iterations']} iters")
    return rows


def write_csv(rows: list[dict], path: str) -> None:
    """Reference-shaped results CSV (H6, ccf_experiments.py:249-256)."""
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        writer.writeheader()
        writer.writerows(rows)


def main() -> None:
    from map_reduce_project_spark import get_spark

    argv = [a for a in sys.argv[1:] if a != "--scala-rng"]
    scala_rng = "--scala-rng" in sys.argv[1:]
    out = argv[0] if argv else "experiment_results.csv"
    # fail on an unwritable output path BEFORE the sweep
    with open(out, "w"):
        pass
    spark = get_spark("ccf-experiments")
    rows = run_sweep(
        spark, progress=lambda s: print(s, flush=True), scala_rng=scala_rng
    )
    write_csv(rows, out)
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
