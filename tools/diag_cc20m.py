"""Round-10 forensics for the 20M-edge reliable-checkpoint CC probe.

Round 9's driver bench and the builder's clean dry run both measured
``ccf_random_df_20m_reliable`` at 939-976 s, vs 567 s in round 8, with
``graph/ccf.py`` and the probe's bench block git-identical across the
two rounds (verified: commit b35ae6c, the last ccf.py change, predates
the round-8 driver bench). Both slow runs happened in the same
clock window on the shared box; this script settles machine-vs-code by
re-running the probe on a quiet box with full per-iteration
instrumentation:

- host state up front: loadavg, free memory, and a direct 1 GiB
  ``/tmp`` write+fsync throughput measurement (the reliable checkpoint
  target);
- the probe FIRST in a fresh JVM (run A) — removes every bench-ordering
  confound — then a second draw in the same JVM (run B) to expose any
  warm/dirty-JVM delta;
- per iteration: wall seconds, new-pair count, checkpoint generation
  size on disk, and status-store deltas (shuffle read/write bytes,
  shuffle write time, fetch wait, executor run/CPU time, spills).

Output: one JSON document to stdout and tools/logs/diag_cc20m.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_project_spark import get_spark
from map_reduce_project_spark.graph import component_count, connected_components
from map_reduce_project_spark.graph.generators import random_graph_df


def disk_probe(path: str = "/tmp", mb: int = 1024) -> dict:
    """Sequential write throughput to the checkpoint filesystem."""
    target = os.path.join(path, "diag_disk_probe.bin")
    buf = os.urandom(1 << 20)
    t0 = time.perf_counter()
    with open(target, "wb") as fh:
        for _ in range(mb):
            fh.write(buf)
        fh.flush()
        os.fsync(fh.fileno())
    wall = time.perf_counter() - t0
    os.remove(target)
    return {"write_mb": mb, "wall_sec": round(wall, 2), "mb_per_sec": round(mb / wall, 1)}


_STAGE_FIELDS = [
    "shuffleWriteBytes",
    "shuffleReadBytes",
    "shuffleWriteTime",  # nanos
    "shuffleFetchWaitTime",  # ms
    "executorRunTime",  # ms
    "executorCpuTime",  # nanos
    "memoryBytesSpilled",
    "diskBytesSpilled",
]


def stage_totals(spark) -> dict:
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    store = spark._jsparkSession.sparkContext().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    tot = dict.fromkeys(_STAGE_FIELDS, 0)
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        for f in _STAGE_FIELDS:
            try:
                tot[f] += getattr(s, f)()
            except Exception:
                pass
    return tot


def run_probe(spark, label: str) -> dict:
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix=f"diag_cc20m_{label}_")
    iters: list[dict] = []
    prev = stage_totals(spark)

    def hook(info: dict) -> None:
        nonlocal prev
        cur = stage_totals(spark)
        delta = {
            "shuffle_write_gb": round((cur["shuffleWriteBytes"] - prev["shuffleWriteBytes"]) / 2**30, 2),
            "shuffle_read_gb": round((cur["shuffleReadBytes"] - prev["shuffleReadBytes"]) / 2**30, 2),
            "shuffle_write_sec": round((cur["shuffleWriteTime"] - prev["shuffleWriteTime"]) / 1e9, 1),
            "fetch_wait_sec": round((cur["shuffleFetchWaitTime"] - prev["shuffleFetchWaitTime"]) / 1e3, 1),
            "executor_run_sec": round((cur["executorRunTime"] - prev["executorRunTime"]) / 1e3, 1),
            "executor_cpu_sec": round((cur["executorCpuTime"] - prev["executorCpuTime"]) / 1e9, 1),
            "mem_spill_gb": round((cur["memoryBytesSpilled"] - prev["memoryBytesSpilled"]) / 2**30, 2),
            "disk_spill_gb": round((cur["diskBytesSpilled"] - prev["diskBytesSpilled"]) / 2**30, 2),
        }
        prev = cur
        iters.append({**info, **delta})
        print(f"  [{label}] iter {info['iteration']}: {info['wall_sec']}s "
              f"new={info['new_pairs']} ckpt={info.get('ckpt_mb')}MB {delta}",
              file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    try:
        res = connected_components(
            random_graph_df(spark, 10_000_000, 20_000_000, seed=42),
            reliable_checkpoint_dir=ckpt,
            on_iteration=hook,
        )
        n_comp = component_count(res.mapping)
        assert res.converged and res.iterate_path == "window"
    finally:
        import tempfile as _tf

        spark.sparkContext.setCheckpointDir(_tf.mkdtemp(prefix="diag_park_"))
        shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "label": label,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "iterations": res.iterations,
        "n_components": n_comp,
        "per_iteration": iters,
    }


def main() -> None:
    report = {
        "loadavg": list(os.getloadavg()),
        "free_mem_gb": round(
            int(next(l for l in open("/proc/meminfo") if l.startswith("MemAvailable")).split()[1]) / 1e6, 1
        ),
        "disk_tmp": disk_probe(),
    }
    print(f"host: {report}", file=sys.stderr, flush=True)

    spark = get_spark("diag_cc20m", extra_conf={"spark.ui.retainedStages": "20000"})
    spark.range(1000).selectExpr("sum(id)").collect()

    # run A: first-in-session, nothing has touched the JVM
    report["run_a_fresh"] = run_probe(spark, "A")
    # run B: same JVM, immediately after — exposes warm-JVM / dirty-state delta
    report["run_b_warm"] = run_probe(spark, "B")
    report["loadavg_end"] = list(os.getloadavg())

    out = json.dumps(report, indent=1)
    os.makedirs("tools/logs", exist_ok=True)
    with open("tools/logs/diag_cc20m.json", "w") as fh:
        fh.write(out + "\n")
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
