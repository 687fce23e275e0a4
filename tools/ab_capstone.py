"""A/B harness for the capstone ladder's stage walls (round 12).

Replicates bench.py's ``synth_capstone_docs`` corpus exactly (same
vocab cap, stride-3 ids, decade attrition, planted spans) and runs
``capstone_funnel_staged`` over it, printing per-stage walls + funnel
counts. Usage:

    python tools/ab_capstone.py [n_docs]     # default 500_000
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_project_spark import get_spark  # noqa: E402
from map_reduce_project_spark.queries.capstone import (  # noqa: E402
    capstone_funnel_staged,
)

CAP_VOCAB = 50_000


def synth_capstone_docs(spark, n_docs: int):
    ids = spark.range(n_docs).select(
        F.col("id"), (F.col("id") * 3).alias("doc_id")
    )
    gid = F.col("id") - (F.col("id") % 10 == 9).cast("long")

    def w(seed, anchor):
        return F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.lit(seed), anchor)) % CAP_VOCAB).cast(
                "string"
            ),
        )

    head = (
        [F.lit("the")]
        + [w(j, F.col("id")) for j in range(10)]
        + [w(1000 + j, gid) for j in range(12)]
        + [w(100 + j, F.col("id")) for j in range(22)]
    )
    tail = [w(200 + j, F.col("id")) for j in range(5)]
    full = F.concat_ws(" ", *(head + tail))
    short = F.concat_ws(" ", *head)
    return ids.select(
        "doc_id",
        F.when(F.col("id") % 20 >= 10, short).otherwise(full).alias("text"),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("ab_capstone")
    t = time.perf_counter()
    staged = capstone_funnel_staged(spark, synth_capstone_docs(spark, n))
    wall = round(time.perf_counter() - t, 3)
    print(json.dumps({"n_docs_pre_fan": n, "wall": wall, **staged}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
