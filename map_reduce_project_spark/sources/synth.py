"""Distributed synthetic star-schema generation at arbitrary scale.

The driver's testdata stops at sf0.1 (600k lineitem); every deeper
probe in bench.py synthesizes its own corpus distributively. This
module extends that pattern to the WHOLE star schema so the headline
relational queries can run at sf1-equivalent volume (6M lineitem)
without any driver-side row materialization: every column is an
expression over ``spark.range`` ids (xxhash64 for pseudo-randomness —
the same generator discipline as ``graph.generators.random_graph_df``
and the bench dedup/ANN/text corpora), and tables are written as
parquet in the same layout ``sources.io.read_table`` expects.

Schemas mirror /root/testdata/sf0.1 exactly (names, dtypes, value
domains — NATION_i names, mktsegments, order statuses, 64-dim float
embeddings) so any registry query runs unchanged against a
synthesized directory; value DISTRIBUTIONS are plausible rather than
bit-identical to the driver generator (bench evidence, not
correctness evidence — the sf0.01 oracle gate owns correctness).

At 100 TB this same module is the load generator: every table is an
embarrassingly parallel projection over a range, so generation scales
with executors and never touches the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sf0.1 row counts; synthesize_sf multiplies by ``scale`` (scale=10
# => sf1-equivalent)
BASE_ROWS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark a the line sort window column order small group join "
    "filter index page block cache shuffle plan query"
).split()
assert len(_VOCAB) == 31

_P_ADJ = ("large", "hot", "blue", "small", "red", "green", "dim", "new")
_P_NOUN = ("ring", "bolt", "cog", "tube", "disk", "plate", "rod", "cap")
_P_TYPE = ("LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO")
_SEGMENTS = (
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
)
_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def _pm(salt: int, m: int) -> str:
    """Deterministic pseudo-uniform value in [0, m) from the range id."""
    return f"pmod(xxhash64(id, {salt}), {m})"


def _pick(options: tuple[str, ...], salt: int) -> str:
    arr = ", ".join(f"'{o}'" for o in options)
    return f"element_at(array({arr}), cast({_pm(salt, len(options))} + 1 as int))"


def region_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(
            ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
        )],
        "r_regionkey int, r_name string",
    )


def nation_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def customer_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", "id").alias("c_name"),
        F.expr(_pm(1, 25)).cast("int").alias("c_nationkey"),
        (F.expr(_pm(2, 1_100_000)) / 100.0 - 1000.0).alias("c_acctbal"),
        F.expr(_pick(_SEGMENTS, 3)).alias("c_mktsegment"),
    )


def supplier_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", "id").alias("s_name"),
        F.expr(_pm(4, 25)).cast("int").alias("s_nationkey"),
        (F.expr(_pm(5, 1_100_000)) / 100.0 - 1000.0).alias("s_acctbal"),
    )


def part_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.expr(_pick(_P_ADJ, 6)), F.lit(" "), F.expr(_pick(_P_NOUN, 7))
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), F.expr(_pm(8, 20)).cast("string")).alias(
            "p_brand"
        ),
        F.expr(_pick(_P_TYPE, 9)).alias("p_type"),
        (F.expr(_pm(10, 50)) + 1).cast("int").alias("p_size"),
        (F.expr(_pm(11, 190_000)) / 100.0 + 100.0).alias("p_retailprice"),
    )


def orders_df(spark: SparkSession, n: int, n_customers: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.expr(_pm(12, n_customers)).alias("o_custkey"),
        F.expr(_pick(("O", "F", "P"), 13)).alias("o_orderstatus"),
        (F.expr(_pm(14, 45_000_000)) / 100.0 + 1000.0).alias(
            "o_totalprice"
        ),
        F.expr(
            f"cast(timestampadd(DAY, cast({_pm(15, 2400)} as int), "
            "timestamp'1995-01-01 00:00:00') as timestamp_ntz)"
        ).alias("o_orderdate"),
        F.expr(_pick(_PRIORITIES, 16)).alias("o_orderpriority"),
    )


def lineitem_df(
    spark: SparkSession, n: int, n_orders: int, n_parts: int, n_supps: int
) -> DataFrame:
    # CEIL division keeps the FK valid without skew: floor would push
    # the last orderkeys past n_orders - 1 at scales where ceil()
    # inflates the two row counts disproportionately, and clamping
    # those rows onto the last orderkey would pile up to a quarter of
    # all lineitems on one hot order — a skew artifact in a generator
    # whose whole point is a known-uniform distribution
    lines_per_order = max(1, -(-n // n_orders))
    qty = f"({_pm(17, 50)} + 1)"
    return spark.range(n).select(
        F.expr(f"id div {lines_per_order}").alias("l_orderkey"),
        F.expr(_pm(18, n_parts)).alias("l_partkey"),
        F.expr(_pm(19, n_supps)).alias("l_suppkey"),
        (F.expr(f"id % {lines_per_order}") + 1).cast("int").alias(
            "l_linenumber"
        ),
        F.expr(qty).cast("double").alias("l_quantity"),
        # 100.0D, not 100.0: Spark SQL parses bare decimal-point
        # literals as DECIMAL, which would propagate decimal(24,2)
        # into a column the driver testdata types as double
        F.expr(
            f"round({qty} * (90000 + {_pm(20, 1_410_000)}) / 100.0D, 2)"
        ).alias("l_extendedprice"),
        (F.expr(_pm(21, 11)) / 100.0).alias("l_discount"),
        (F.expr(_pm(22, 9)) / 100.0).alias("l_tax"),
        F.expr(_pick(("A", "N", "R"), 23)).alias("l_returnflag"),
        F.expr(_pick(("O", "F"), 24)).alias("l_linestatus"),
        F.expr(
            f"cast(timestampadd(DAY, cast({_pm(25, 2500)} as int), "
            "timestamp'1995-01-02 00:00:00') as timestamp_ntz)"
        ).alias("l_shipdate"),
    )


def events_df(spark: SparkSession, n: int) -> DataFrame:
    n_users = max(100, n // 100)
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"cast(timestampadd(SECOND, "
            f"cast(id * 5 + {_pm(26, 3600)} as int), "
            "timestamp'2024-01-01 00:00:00') as timestamp_ntz)"
        ).alias("ts"),
        F.expr(_pm(27, n_users)).alias("user_id"),
        F.expr(_pick(_EVENT_TYPES, 28)).alias("event_type"),
        (F.expr(_pm(29, 20_000)) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), F.expr(_pm(30, 100)).cast("string"), F.lit("}")
        ).alias("props"),
    )


def documents_df(spark: SparkSession, n: int) -> DataFrame:
    vocab = ", ".join(f"'{w}'" for w in _VOCAB)
    text = (
        f"array_join(transform(sequence(1, cast(10 + {_pm(31, 90)} as int)),"
        f" i -> element_at(array({vocab}),"
        f" cast(pmod(xxhash64(id, i, 32), {len(_VOCAB)}) + 1 as int))), ' ')"
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(text).alias("text"),
            F.expr(_pick(("en", "es", "de", "fr", "zh"), 33)).alias("lang"),
            F.concat(
                F.lit("src"), F.expr(_pm(34, 20)).cast("string")
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def embeddings_df(spark: SparkSession, n: int, dims: int = 64) -> DataFrame:
    vec = (
        f"transform(sequence(1, {dims}), i -> "
        f"cast(pmod(xxhash64(id, i, 35), 2001) / 1000.0 - 1.0 as float))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(vec).alias("embedding"),
        F.expr(_pm(36, 10)).cast("int").alias("label"),
    )


def synthesize_sf(
    spark: SparkSession, out_dir: str, scale: float = 10.0
) -> dict[str, int]:
    """Write a full synthetic star-schema directory at ``scale`` times
    sf0.1 volume (scale=10 => sf1-equivalent). Returns row counts."""
    rows = {t: max(1, math.ceil(n * scale)) for t, n in BASE_ROWS.items()}
    frames = {
        "region": region_df(spark),
        "nation": nation_df(spark),
        "customer": customer_df(spark, rows["customer"]),
        "supplier": supplier_df(spark, rows["supplier"]),
        "part": part_df(spark, rows["part"]),
        "orders": orders_df(spark, rows["orders"], rows["customer"]),
        "lineitem": lineitem_df(
            spark,
            rows["lineitem"],
            rows["orders"],
            rows["part"],
            rows["supplier"],
        ),
        "events": events_df(spark, rows["events"]),
        "documents": documents_df(spark, rows["documents"]),
        "embeddings": embeddings_df(spark, rows["embeddings"]),
    }
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    rows["region"], rows["nation"] = 5, 25
    return rows
