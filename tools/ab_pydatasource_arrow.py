"""Interleaved A/B (round-13, verdict item 5): the Python DataSource
read() yielding Arrow RecordBatches (round-12 rewrite) vs scalar
tuples, same JVM, alternating draws — batch read and the 10-microbatch
stream drain, the two shapes stream_agg_df_1m exercises."""
import json
import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from map_reduce_project_spark import get_spark
from map_reduce_project_spark.sources import pydatasource as P
from pyspark.sql import functions as F

N = 1_000_000

def read_tuples(self, partition):
    """Round-11 scalar twin of _TelemetryReader.read."""
    for rid in range(partition.start, partition.end):
        yield P.telemetry_row(rid)

def main():
    spark = get_spark("pyds-arrow-ab")
    P.register(spark)
    arrow_read = P._TelemetryReader.read
    arrow_sread = P._TelemetryStreamReader.read

    def batch_scan():
        t = time.perf_counter()
        row = (
            spark.read.format("synthetic_telemetry")
            .option("n_rows", N).option("n_partitions", 16).load()
            .agg(F.count("*").alias("n"), F.sum("reading").alias("s"))
            .collect()[0]
        )
        assert row["n"] == N
        return round(time.perf_counter() - t, 3)

    def stream_drain():
        name = f"ab_{uuid.uuid4().hex[:8]}"
        t = time.perf_counter()
        q = (
            spark.readStream.format("synthetic_telemetry")
            .option("n_rows", N).option("rows_per_batch", 100_000)
            .option("n_partitions", 16).load()
            .groupBy("device")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .trigger(processingTime="0 seconds").start()
        )
        deadline = time.time() + 300
        try:
            while time.time() < deadline:
                row = spark.table(name).agg(F.sum("n").alias("s")).collect()
                if row and row[0]["s"] == N:
                    break
                time.sleep(0.2)
        finally:
            q.stop()
        return round(time.perf_counter() - t, 3)

    res = {"batch": {"arrow": [], "tuple": []},
           "stream": {"arrow": [], "tuple": []}}
    batch_scan()  # warm-up outside the A/B
    for _ in range(4):
        for label, rfn, sfn in (("arrow", arrow_read, arrow_sread),
                                ("tuple", read_tuples, read_tuples)):
            P._TelemetryReader.read = rfn
            P._TelemetryStreamReader.read = sfn
            res["batch"][label].append(batch_scan())
    for _ in range(2):
        for label, rfn, sfn in (("arrow", arrow_read, arrow_sread),
                                ("tuple", read_tuples, read_tuples)):
            P._TelemetryReader.read = rfn
            P._TelemetryStreamReader.read = sfn
            res["stream"][label].append(stream_drain())
    P._TelemetryReader.read = arrow_read
    P._TelemetryStreamReader.read = arrow_sread
    out = {
        shape: {k: {"draws": v, "median": statistics.median(v)}
                for k, v in d.items()}
        for shape, d in res.items()
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "logs",
                           "ab_pydatasource_arrow_r13.json"), "w") as f:
        json.dump(out, f, indent=1)

if __name__ == "__main__":
    main()
