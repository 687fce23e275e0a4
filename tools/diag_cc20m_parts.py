"""Round-10 experiment: shuffle-partition count vs 20M-edge CC wall.

diag_cc20m.py established the probe is CPU-bound with enormous sort
spill at the loop's modeled 106 partitions (iter-5 deltas: 77 GB
memory-spill / 12.6 GB disk-spill — true peak pair volume is ~470M
rows, ~23x the edge count, far above the sizing model's _GROWTH=8
estimate, so partitions carry ~3-4M rows each and every window sort
spills). It also showed the wall is hypersensitive to JVM heap state
(run B, same JVM: 2-3x slower per iteration) — which is what made
r8 (567 s) vs r9 (939 s) look like a code regression when the code
was identical.

This script runs the SAME probe once per partition-count override in
a fresh JVM each (subprocess when invoked with an argument), so the
spill hypothesis gets a clean A/B: if the wall drops materially at
higher partition counts, the loop's _MAX_ROWS_PER_PARTITION /
_GROWTH sizing gets re-fitted.

Usage:
  python tools/diag_cc20m_parts.py <target_partitions>   # one run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    target = int(sys.argv[1])

    from map_reduce_project_spark import get_spark
    from map_reduce_project_spark.graph import (
        component_count,
        connected_components,
    )
    from map_reduce_project_spark.graph import ccf as ccf_mod
    from map_reduce_project_spark.graph.generators import random_graph_df

    if target > 0:
        ccf_mod._loop_shuffle_partitions = lambda n_edges: target  # type: ignore

    spark = get_spark(
        "diag_cc20m_parts",
        extra_conf={"spark.ui.retainedStages": "20000"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    import shutil
    import tempfile

    iters: list[dict] = []
    ckpt = tempfile.mkdtemp(prefix=f"diag_parts{target}_")
    t0 = time.perf_counter()
    try:
        res = connected_components(
            random_graph_df(spark, 10_000_000, 20_000_000, seed=42),
            reliable_checkpoint_dir=ckpt,
            on_iteration=lambda info: (
                iters.append(info),
                print(f"  iter {info}", file=sys.stderr, flush=True),
            )[0],
        )
        n_comp = component_count(res.mapping)
        assert res.converged and res.iterate_path == "window"
    finally:
        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="diag_park_")
        )
        shutil.rmtree(ckpt, ignore_errors=True)
    out = {
        "target_partitions": target,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "iterations": res.iterations,
        "n_components": n_comp,
        "per_iteration": [
            {k: v for k, v in it.items() if k != "checkpoint_dir"}
            for it in iters
        ],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
