"""The determinism auditor must actually catch the class it hunts.

tools/determinism_check.py runs every query under two deliberately
different physical configurations and compares canonical hashes. A
green audit is only evidence if a partition-dependent query really
does diverge between the passes — so this suite plants queries whose
results encode physical execution details (scan split count, shuffle
partition count) and asserts the two passes disagree on them, while a
well-behaved aggregate stays stable.

run_pass stops and rebuilds SparkSessions per pass, which would kill
the suite's session-scoped ``spark`` fixture — so the audit runs in a
subprocess and reports its verdict over stdout.
"""

from __future__ import annotations

import json
import subprocess
import sys

_PROBE = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from tools.determinism_check import run_pass

SF = "/root/testdata/sf0.01"


def scan_parts(spark, sf_dir):
    # number of scan splits reaches the result: pass B's 1 MB
    # maxPartitionBytes + zero open cost slice the ~1 MB sf0.01
    # lineitem into several input partitions; pass A reads one.
    # getNumPartitions counts EMPTY splits too (a one-row-group file
    # materializes all rows in one split, so a per-row partition-id
    # probe would miss the layout change)
    from pyspark.sql import functions as F
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = df.rdd.getNumPartitions()
    return spark.range(1).select(F.lit(n).alias("n_parts"))


def shuffle_parts(spark, sf_dir):
    # shuffle partition count reaches the result: a high-cardinality
    # repartition key fills all 8 (pass A) vs 7 (pass B) partitions
    from pyspark.sql import functions as F
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return df.repartition("o_orderkey").select(
        F.spark_partition_id().alias("p")
    ).agg(F.countDistinct("p").alias("n_shuffle"))


def stable_agg(spark, sf_dir):
    from pyspark.sql import functions as F
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return df.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")
    )


# AQE note: pass A has AQE on, which coalesces the post-shuffle
# partitions of shuffle_parts when they are tiny — also a physical
# detail, also visible to the audit; either way the two passes must
# disagree on the planted queries.


registry = {
    "planted_scan_parts": scan_parts,
    "planted_shuffle_parts": shuffle_parts,
    "control_stable_agg": stable_agg,
}
a = run_pass("A", SF, set(), registry=registry)
b = run_pass("B", SF, set(), registry=registry)
print("VERDICT " + json.dumps({
    "control_stable": a["control_stable_agg"] == b["control_stable_agg"],
    "scan_diverged": a["planted_scan_parts"] != b["planted_scan_parts"],
    "shuffle_diverged":
        a["planted_shuffle_parts"] != b["planted_shuffle_parts"],
    "errors": [n for n, v in list(a.items()) + list(b.items())
               if v[0] == "ERROR"],
}))
"""


def test_auditor_catches_planted_nondeterminism():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("VERDICT ")
    ]
    assert line, proc.stdout[-2000:]
    v = json.loads(line[-1][len("VERDICT "):])
    assert v["errors"] == [], v
    # a well-behaved aggregate must hash identically across configs
    assert v["control_stable"], v
    # physical-plan-dependent results MUST diverge between the passes
    # (this is what makes a full-registry STABLE log meaningful)
    assert v["scan_diverged"], v
    assert v["shuffle_diverged"], v
