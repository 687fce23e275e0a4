"""Interleaved A/B: WARC DataSource read() yielding Arrow RecordBatches
(round-12 rewrite) vs the tuple protocol (round-11 path), same JVM,
alternating draws on a warm session — the clean measurement round-12's
verdict item 5 asked for (the r12 A/B was quoted against a contended
baseline)."""
import os, sys, time, tempfile, shutil, json, statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from map_reduce_project_spark import get_spark
from map_reduce_project_spark.sources import warc as W
from pyspark.sql import functions as F

def read_tuples(self, partition):
    """Round-11 tuple-protocol twin of _WarcReader.read (same parser,
    same column order) for the A/B."""
    base = os.path.basename(partition.path)
    with open(partition.path, "rb") as raw:
        stream = W._wrap_archive(raw)
        for rec in W.iter_warc_records(stream, source=partition.path):
            h = rec["headers"]
            yield (
                base, rec["record_pos"], rec["version"],
                h.get("warc-type"), h.get("warc-record-id"),
                h.get("warc-target-uri"), h.get("warc-date"),
                h.get("content-type"), int(h["content-length"]),
                rec["payload"],
            )

def main():
    spark = get_spark("warc-arrow-ab")
    d = tempfile.mkdtemp(prefix="warc_ab_")
    arrow_read = W._WarcReader.read
    res = {"arrow": [], "tuple": []}
    try:
        W.write_bench_warc_dir(spark, d, n_files=200, recs_per_file=2500)
        def scan():
            t = time.perf_counter()
            row = (W.read_warc(spark, d)
                   .where(F.col("warc_type") == "conversion")
                   .agg(F.count("*").alias("n"),
                        F.sum(F.length("payload")).alias("chars"))
                   .collect()[0])
            assert row["n"] == 500_000
            return round(time.perf_counter() - t, 3)
        scan()  # warm-up draw (worker spawn, JIT) outside the A/B
        for i in range(4):
            for label, fn in (("arrow", arrow_read), ("tuple", read_tuples)):
                W._WarcReader.read = fn
                res[label].append(scan())
    finally:
        W._WarcReader.read = arrow_read
        shutil.rmtree(d, ignore_errors=True)
    out = {k: {"draws": v, "median": statistics.median(v), "min": min(v)}
           for k, v in res.items()}
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "logs",
                           "ab_warc_arrow_r13.json"), "w") as f:
        json.dump(out, f, indent=1)

if __name__ == "__main__":
    main()
