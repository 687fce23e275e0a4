"""Remaining operator-category coverage: cube grouping sets, RANGE
window frames, array higher-order functions, approximate distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_reduce_project_spark.functions.exact import (
    limb_exact_double as _limb_exact_double,
)
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

DEC = "decimal(18,2)"


def q20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping sets."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
    )


Q20_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q21_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-customer revenue within the last 30 days of
    each order (event-time window frame, not row-count frame)."""
    orders = read_table(spark, sf_dir, "orders")
    day = F.unix_timestamp("o_orderdate") / 86400
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast("double")
        .alias("trailing_30d_revenue"),
        F.count("*").over(w).alias("trailing_30d_orders"),
    )


Q21_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d_revenue,
  COUNT(*) OVER w AS trailing_30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


def q22_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column:
    filter/transform/aggregate (exact int arithmetic via quantization),
    sort/slice — the array-manipulation surface."""
    emb = read_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < 200
    )
    qarr = F.expr(
        "transform(embedding, v -> cast(floor(cast(v as double) * 16777216) as bigint))"
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.expr(
            "size(filter(embedding, v -> v > 0))"
        ).cast("long").alias("n_positive"),
        F.aggregate(
            qarr, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("qsum"),
        F.expr(
            "aggregate(transform(embedding, v -> cast(floor(cast(v as double) * 16777216) as bigint)),"
            " cast(0 as bigint), (acc, v) -> greatest(acc, abs(v)))"
        ).alias("qmax_abs"),
        F.element_at(
            F.expr(
                "slice(sort_array(transform(embedding, v -> cast(floor(cast(v as double) * 16777216) as bigint)), false), 1, 1)"
            ),
            1,
        ).alias("qtop"),
    )


Q22_SQL = """
SELECT vec_id,
  CAST(LEN(embedding) AS BIGINT) AS dim,
  CAST(LEN(list_filter(embedding, v -> v > 0)) AS BIGINT) AS n_positive,
  CAST(list_sum(list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 16777216) AS BIGINT))) AS BIGINT) AS qsum,
  CAST(list_max(list_transform(embedding, v -> ABS(CAST(FLOOR(CAST(v AS DOUBLE) * 16777216) AS BIGINT)))) AS BIGINT) AS qmax_abs,
  CAST(list_max(list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 16777216) AS BIGINT))) AS BIGINT) AS qtop
FROM embeddings
WHERE vec_id < 200
"""


def q23_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct counts — the 100 TB-scale substitute for
    exact COUNT(DISTINCT) — under the EXACT hash gate via a twin
    formulation: sketch internals differ per engine, so the sketch
    estimate itself is folded into an engine-side tolerance verdict
    (|approx - exact| / exact <= 3 x rsd) and the gated columns are
    the exact count plus that boolean. A drifting HLL flips the
    boolean and hash-mismatches against the oracle's literal TRUE; the
    exact twin is one extra partial+final agg at gate scale only."""
    li = read_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd).alias("_approx"),
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            "n_rows",
            (
                F.abs(F.col("_approx") - F.col("exact_orders"))
                <= 3 * rsd * F.col("exact_orders")
            ).alias("within_tolerance"),
        )
    )


Q23_SQL = """
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  TRUE AS within_tolerance
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = [
    Query("q20_cube", q20_cube, Q20_SQL, "CUBE grouping sets"),
    Query("q21_range_frame", q21_range_frame, Q21_SQL, "RANGE window frame (trailing 30 days)"),
    Query("q22_array_functions", q22_array_functions, Q22_SQL, "array filter/transform/aggregate/sort HOFs"),
    Query("q23_approx_distinct", q23_approx_distinct, Q23_SQL, "HyperLogLog approx distinct + exact twin, tolerance verdict under the hash gate"),
]


def q24_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators.scale.salted_agg) under
    the oracle gate: results must equal the plain one-phase GROUP BY.
    At 100 TB this is the shape for skewed group keys whose post-combine
    state still overwhelms one reducer."""
    from map_reduce_project_spark.operators.scale import salted_agg

    orders = read_table(spark, sf_dir, "orders").withColumn(
        "p", F.col("o_totalprice").cast(DEC)
    )
    out = salted_agg(
        orders,
        ["o_orderstatus"],
        {"n_orders": "count(*)", "revenue": "sum(p)"},
        n_salts=8,
    )
    return out.select(
        "o_orderstatus",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
    )


Q24_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY o_orderstatus
"""

def q25_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not derivable from cube/rollup): per
    status, per priority, and the grand total — one pass, Catalyst
    Expand operator (DataFrame.groupingSets, Spark 4)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
    )


Q25_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q26_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/dense_rank over per-customer order history (unique
    (orderdate, orderkey) tiebreak keeps every engine's ordering
    identical)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (
            F.col("o_totalprice") - F.lag("o_totalprice").over(w)
        ).alias("delta_prev"),
        F.dense_rank()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate"))
        .cast("long")
        .alias("date_rank"),
    )


Q26_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
  LAG(o_totalprice) OVER w AS prev_price,
  LEAD(o_totalprice) OVER w AS next_price,
  o_totalprice - LAG(o_totalprice) OVER w AS delta_prev,
  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS date_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q27_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p50/p75) of lineitem
    quantity per return flag — Spark `percentile` and DuckDB
    `quantile_cont` share the (n-1)*p linear-interpolation definition."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.count("*").alias("n"),
    )


Q27_SQL = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.25) AS p25,
  quantile_cont(l_quantity, 0.5) AS p50,
  quantile_cont(l_quantity, 0.75) AS p75,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES.append(
    Query("q24_salted_agg", q24_salted_segment_revenue, Q24_SQL, "skew-safe two-phase salted aggregation")
)
QUERIES.extend(
    [
        Query("q25_grouping_sets", q25_grouping_sets, Q25_SQL, "arbitrary GROUPING SETS in one Expand pass"),
        Query("q26_lag_lead", q26_lag_lead, Q26_SQL, "lag/lead/dense_rank over per-customer order history"),
        Query("q27_percentiles", q27_percentiles, Q27_SQL, "exact interpolated percentiles per group"),
    ]
)


def q28_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-priority columns per order status, hand-lowered to
    a single-shuffle conditional aggregation. `df.groupBy().pivot()`
    with explicit values plans TWO exchanges (pair-level agg, then a
    pivotfirst agg) and without explicit values adds a distinct-scan
    job on top — at 100 TB the conditional-agg lowering halves the
    shuffle for identical semantics, so it's the engine's pivot."""
    orders = read_table(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    price = F.col("o_totalprice").cast(DEC)
    return orders.groupBy("o_orderstatus").agg(
        *[
            F.sum(F.when(F.col("o_orderpriority") == p, price))
            .cast("double")
            .alias(f"rev_p{i + 1}")
            for i, p in enumerate(prios)
        ]
    )


Q28_SQL = """
SELECT o_orderstatus,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p1,
  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p2,
  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p3,
  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p4,
  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p5
FROM orders
GROUP BY o_orderstatus
"""


def q29_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-window surface in one pass: ntile
    quartiles, percent_rank, cume_dist per customer ordered by
    (totalprice, orderkey) — the unique tiebreaker makes every rank
    deterministic, and percent_rank/cume_dist are exact small-int
    ratios so the doubles are bit-identical across engines."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


Q29_SQL = """
SELECT o_custkey, o_orderkey,
  NTILE(4) OVER w AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


def q30_vector_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of the embedding vectors (posexplode keeps the
    ordinal) -> per-dimension moments over int64-quantized values
    (floor(x * 2^24): float32 -> double is exact and the power-of-two
    scaling only shifts the exponent, so both engines see identical
    integers). The explode is a narrow 1->64 flatMap — no shuffle
    until the 64-group aggregate."""
    emb = read_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < 500
    )
    q = F.floor(F.col("x") * (1 << 24)).cast("long")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .select("dim", q.alias("q"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("q").alias("sum_q"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
        )
    )


Q30_SQL = """
SELECT dim, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q,
       MIN(q) AS min_q, MAX(q) AS max_q
FROM (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(unnest(embedding) * 16777216) AS BIGINT) AS q
  FROM embeddings WHERE vec_id < 500
)
GROUP BY dim
"""


QUERIES.extend(
    [
        Query("q28_pivot", q28_pivot, Q28_SQL, "pivot with explicit value list (conditional-agg oracle)"),
        Query("q29_rank_suite", q29_rank_suite, Q29_SQL, "ntile/percent_rank/cume_dist ranking windows"),
        Query("q30_vector_unnest", q30_vector_unnest, Q30_SQL, "posexplode embeddings -> per-dimension quantized moments"),
    ]
)


def q31_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax/argmin as a pure AGGREGATION (max_by/min_by
    over a struct ordering key with the unique orderkey tiebreak) —
    bounded per-group state with full map-side partial aggregation,
    the scale path for "row of the extreme" questions that q8 answers
    with a rank window (which must shuffle-sort EVERY row)."""
    orders = read_table(spark, sf_dir, "orders")
    best = F.struct("o_totalprice", "o_orderkey")
    first = F.struct("o_orderdate", "o_orderkey")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", best).alias("best_orderkey"),
        F.max("o_totalprice").alias("best_price"),
        F.min_by("o_orderkey", first).alias("first_orderkey"),
        F.min("o_orderdate").alias("first_orderdate"),
        F.count("*").alias("n_orders"),
    )


Q31_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC) AS rf
  FROM orders
), agg AS (
  SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_totalprice) AS best_price,
         MIN(o_orderdate) AS first_orderdate
  FROM orders GROUP BY o_custkey
)
SELECT a.o_custkey, b.o_orderkey AS best_orderkey, a.best_price,
       f.o_orderkey AS first_orderkey, a.first_orderdate, a.n_orders
FROM agg a
JOIN ranked b ON b.o_custkey = a.o_custkey AND b.rb = 1
JOIN ranked f ON f.o_custkey = a.o_custkey AND f.rf = 1
"""


def q32_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing (from_json with an explicit schema — one
    parse per row instead of one per get_json_object path) plus the
    map-type surface (map_from_arrays / element_at / map_keys)."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = read_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json(
            "props", StructType([StructField("k", LongType())])
        ).alias("p"),
    ).select(
        "event_id",
        "event_type",
        F.col("p.k").alias("k"),
        F.map_from_arrays(
            F.array(F.lit("k")), F.array(F.col("p.k"))
        ).alias("m"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.element_at("m", "k")).alias("sum_k"),
        F.sum(F.size(F.map_keys("m"))).alias("total_keys"),
        F.min("k").alias("min_k"),
    )


Q32_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(1) AS BIGINT) AS total_keys,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events
GROUP BY event_type
"""


def q34_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join with a Bloom-style runtime pre-filter
    (operators/scale.py:bloom_prune_join): the selective part-dim
    filter is reduced to a bounded coarse-bucket set, broadcast, and
    applied to the lineitem scan as a semi join BEFORE the exact join —
    the manual spelling of runtime dynamic filtering. Exact by
    construction (the final join removes bucket false positives), so
    the oracle is the plain join."""
    from map_reduce_project_spark.operators.scale import bloom_prune_join

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        "l_extendedprice",
        "l_discount",
    )
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        bloom_prune_join(li, part, "p_partkey")
        .groupBy("p_brand")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q34_SQL = """
SELECT p_brand,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 5
GROUP BY p_brand
"""


QUERIES.extend(
    [
        Query("q31_argmax", q31_argmax, Q31_SQL, "max_by/min_by argmax aggregation (bounded-state top-1)"),
        Query("q32_json_struct", q32_json_struct, Q32_SQL, "typed from_json + map functions"),
        Query("q34_bloom_prune_join", q34_bloom_prune_join, Q34_SQL, "Bloom-bucket runtime pre-filter join (manual dynamic filtering)"),
    ]
)


# One SQL text, two engines: the query IS the oracle. This is the
# engine's raw-SQL entry point (register_views + spark.sql) exercising
# constructs the DataFrame queries express as joins: a correlated
# EXISTS, a correlated scalar subquery, and an uncorrelated scalar
# subquery. Catalyst decorrelates both into joins at plan time.
Q33_SQL = """
SELECT c.c_custkey, c.c_name,
  (SELECT COUNT(*) FROM orders o
   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    AS n_open_orders
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                 / COUNT(*) * 1.5
                          FROM orders o2)
)
"""


def q33_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL surface: the exact oracle text runs through spark.sql
    over the registered views — correlated EXISTS + correlated scalar
    subquery + uncorrelated scalar subquery, decorrelated by Catalyst
    into semi/aggregate joins (assert with .explain: no per-row
    re-execution, unlike a naive nested-loop interpreter)."""
    from map_reduce_project_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(Q33_SQL)


QUERIES.append(
    Query("q33_sql_surface", q33_sql_surface, Q33_SQL, "raw spark.sql entry: correlated EXISTS + scalar subqueries, one SQL text for both engines")
)


def q35_udaf_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (GROUPED_AGG) under the exact gate: per-priority
    median order value in cents. Cents are exact int64 (decimal cast
    then scale), and the UDAF's avg-of-middles median is the same one
    IEEE division DuckDB's median(BIGINT) performs — so a PYTHON
    aggregation hash-matches the SQL oracle bit-for-bit.

    Scale note (functions/udafs.py): GROUPED_AGG has no partial
    aggregation — each group's column ships to Python whole. Fine for
    bounded groups (5 priorities here); for million-row groups use
    built-in percentile_approx or the exact two-pass percentile of
    q27 instead.
    """
    from map_reduce_project_spark.functions.udafs import median_long_udaf

    orders = read_table(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("long")
    return (
        orders.select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(median_long_udaf("cents").alias("median_cents"))
    )


Q35_SQL = """
SELECT o_orderpriority,
  median(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
    AS median_cents
FROM orders
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q35_udaf_median",
        q35_udaf_median_q,
        Q35_SQL,
        "pandas GROUPED_AGG UDAF: exact int64-cents median vs DuckDB median(BIGINT)",
    )
)


def q36_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample variance/stddev/covariance/
    correlation) made hash-exact: built-in corr()/stddev() accumulate
    doubles in partition order (not reproducible across engines), so
    the moments are aggregated as exact integers instead — cents in
    int64, product sums in DECIMAL(38,0) — and every derived statistic
    is ONE fixed expression tree of IEEE ops (-, *, /, sqrt are all
    correctly rounded) over identically-rounded double casts of those
    exact sums. Verified bit-identical to DuckDB on every moment.

    Single shuffle: broadcast the customer dim, one grouped aggregate;
    at 100 TB the partial aggregation combines map-side so the
    exchange carries 6 numbers per (segment, partition)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    xc = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    yc = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    j = o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_mktsegment").alias("seg"), xc.alias("xc"), yc.alias("yc")
    )
    m = j.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum((F.col("xc") * F.col("yc")).cast("decimal(38,0)")).alias(
            "sxyd"
        ),
        F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).alias(
            "sxxd"
        ),
        F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)")).alias(
            "syyd"
        ),
    ).select(
        "seg",
        "n",
        "sx",
        "sy",
        # product sums reach ~2.5e19 at sf0.1 — past 2^53, so the
        # double conversion must be limb-exact (see _limb_exact_double)
        _limb_exact_double(F.col("sxyd")).alias("sxy"),
        _limb_exact_double(F.col("sxxd")).alias("sxx"),
        _limb_exact_double(F.col("syyd")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    var_x = (F.col("sxx") - sxd * sxd / nd) / (nd - F.lit(1.0))
    var_y = (F.col("syy") - syd * syd / nd) / (nd - F.lit(1.0))
    covar = (F.col("sxy") - sxd * syd / nd) / (nd - F.lit(1.0))
    return m.select(
        "seg",
        F.col("n").alias("n_orders"),
        (sxd / nd).alias("mean_acctbal_cents"),
        (syd / nd).alias("mean_price_cents"),
        F.sqrt(var_x).alias("stddev_acctbal"),
        F.sqrt(var_y).alias("stddev_price"),
        covar.alias("covar_samp"),
        (covar / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr"),
    )


Q36_SQL = """
WITH j AS (
  SELECT c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
  FROM orders JOIN customer ON c_custkey = o_custkey
), m AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
    SUM(CAST(xc AS HUGEINT)*yc) AS sxyr,
    SUM(CAST(xc AS HUGEINT)*xc) AS sxxr,
    SUM(CAST(yc AS HUGEINT)*yc) AS syyr
  FROM j GROUP BY seg
), mm AS (
  SELECT seg, n, sx, sy,
    ((CAST((((sxyr - sxyr % 1125899906842624) // 1125899906842624) - ((sxyr - sxyr % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((sxyr - sxyr % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(sxyr % 1125899906842624 AS DOUBLE)) AS sxy,
    ((CAST((((sxxr - sxxr % 1125899906842624) // 1125899906842624) - ((sxxr - sxxr % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((sxxr - sxxr % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(sxxr % 1125899906842624 AS DOUBLE)) AS sxx,
    ((CAST((((syyr - syyr % 1125899906842624) // 1125899906842624) - ((syyr - syyr % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((syyr - syyr % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(syyr % 1125899906842624 AS DOUBLE)) AS syy
  FROM m
)
SELECT seg, n AS n_orders,
  CAST(sx AS DOUBLE) / n AS mean_acctbal_cents,
  CAST(sy AS DOUBLE) / n AS mean_price_cents,
  sqrt((sxx - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) / (n - 1.0)) AS stddev_acctbal,
  sqrt((syy - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n) / (n - 1.0)) AS stddev_price,
  (sxy - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n) / (n - 1.0) AS covar_samp,
  ((sxy - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n) / (n - 1.0))
    / (sqrt((sxx - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) / (n - 1.0))
       * sqrt((syy - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n) / (n - 1.0))) AS corr
FROM mm
"""


QUERIES.append(
    Query("q36_stats_suite", q36_stats_suite, Q36_SQL, "sample stddev/covar/corr from exact integer moments (hash-exact statistical aggregates)")
)


def q37_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling: fixed-width histogram of order totals
    (the doc-length/price-distribution profile every curation run
    reports). Buckets via exact integer floor-division of cents —
    `width_bucket` semantics without float boundary ambiguity — and
    per-bucket count/sum partials combine map-side: one scan + one
    tiny shuffle regardless of corpus size."""
    o = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    # 25_000_00-cent ($25k) buckets, clamped to [0, 24]
    bucket = F.least(F.greatest(cents / 2500000, F.lit(0)), F.lit(24)).cast(
        "bigint"
    )
    return (
        o.select(bucket.alias("bucket"), cents.alias("cents"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


Q37_SQL = """
WITH b AS (
  SELECT least(greatest(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 2500000, 0), 24) AS bucket,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(cents) AS BIGINT) AS sum_cents,
  CAST(MIN(cents) AS BIGINT) AS min_cents,
  CAST(MAX(cents) AS BIGINT) AS max_cents
FROM b GROUP BY bucket
"""


QUERIES.append(
    Query("q37_histogram", q37_histogram, Q37_SQL, "fixed-width histogram profile via exact integer binning (one scan, map-side combine)")
)


def q38_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE run BY SPARK (Catalyst's recursive-CTE support,
    new in Spark 4): transitive ancestor closure over the implicit
    supplier binary tree (parent(k) = k div 2). Tree recursion means
    every (node, ancestor) path is unique, so UNION ALL cannot
    explode and the fixpoint depth is log2(max key). The DuckDB twin
    is the same query in its dialect — both engines run a genuine
    recursive plan, and the hash gate pins them equal."""
    from map_reduce_project_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
      WITH RECURSIVE anc AS (
        SELECT s_suppkey AS node, CAST(s_suppkey AS BIGINT) AS ancestor,
               CAST(0 AS BIGINT) AS depth
        FROM supplier
        UNION ALL
        SELECT node, ancestor DIV 2, depth + 1
        FROM anc WHERE ancestor > 0
      )
      SELECT node, ancestor, depth FROM anc
    """)


Q38_SQL = """
WITH RECURSIVE anc AS (
  SELECT s_suppkey AS node, CAST(s_suppkey AS BIGINT) AS ancestor,
         CAST(0 AS BIGINT) AS depth
  FROM supplier
  UNION ALL
  SELECT node, ancestor // 2, depth + 1
  FROM anc WHERE ancestor > 0
)
SELECT node, ancestor, depth FROM anc
"""

QUERIES.append(
    Query(
        "q38_recursive_cte",
        q38_recursive_cte,
        Q38_SQL,
        "Spark-side WITH RECURSIVE ancestor closure vs the same recursive query in DuckDB",
    )
)


def q39_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational melt via DataFrame.unpivot (wide attribute columns
    -> (attr, val) rows, the inverse of pivot): lowered to a single
    Expand over one scan — no shuffle, no per-attribute pass."""
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


Q39_SQL = """
SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
"""

QUERIES.append(
    Query(
        "q39_unpivot",
        q39_unpivot,
        Q39_SQL,
        "unpivot/melt to (attr, val) rows in one Expand over one scan",
    )
)


_LATERAL_SQL_BODY = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o
"""


def q40_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery run BY SPARK (per-customer top-2
    orders): the SQL-surface twin of the window-function top-k
    (q8_topk_per_customer). Catalyst decorrelates the lateral into a
    ranked join rather than re-executing the subquery per outer row;
    DuckDB runs the identical query text, and the hash gate pins the
    two engines equal."""
    from map_reduce_project_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL_BODY)


QUERIES.append(
    Query(
        "q40_lateral_topk",
        q40_lateral_topk,
        _LATERAL_SQL_BODY,
        "correlated LATERAL subquery top-k per group, decorrelated by Catalyst",
    )
)

def q41_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median price per return flag: the
    smallest price whose running weight reaches half the group's
    total — one sort window for the running weight, one conditional
    min; every operand integer (price cents, integral quantities), so
    the tie-handling and the result are bit-exact on any engine.
    Distinct from q27's unweighted exact percentiles: the weight
    column changes the rank arithmetic, and the cumulative-weight
    formulation is the one that generalizes to any quantile."""
    from pyspark.sql.window import Window

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "cents",
        F.sum("qty").over(w).alias("cum_w"),
        F.sum("qty").over(tot).alias("tot_w"),
    )
    return (
        cum.where(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").alias("weighted_median_cents"),
            F.max("tot_w").alias("total_weight"),
        )
    )


Q41_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), cum AS (
  SELECT l_returnflag, cents,
         SUM(qty) OVER (PARTITION BY l_returnflag ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_w,
         SUM(qty) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM li
)
SELECT l_returnflag,
  CAST(MIN(cents) AS BIGINT) AS weighted_median_cents,
  CAST(MAX(tot_w) AS BIGINT) AS total_weight
FROM cum WHERE cum_w * 2 >= tot_w
GROUP BY l_returnflag
"""

QUERIES.append(
    Query(
        "q41_weighted_median",
        q41_weighted_median,
        Q41_SQL,
        "exact weighted median via cumulative-weight window, all-integer",
    )
)

def q42_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis, hash-exact: raw power sums up to
    the 4th accumulated as exact integers/DECIMAL(38,0) (cents^4 at
    ~6e30 per row leaves two orders of magnitude of headroom at sf0.1;
    at 1e9+ rows shard the sum into per-bucket decimals or rescale
    cents first — documented bound, same as q36's moment machinery),
    then ONE fixed IEEE expression tree per statistic over
    LIMB-EXACT doubles of those sums (three < 2^53 limbs recombined
    with one identical IEEE add — a direct big-int -> double cast can
    differ cross-engine by an ulp on boundary values, which the
    cancellation-sensitive raw-moment formulas amplify; caught by the
    sf0.1 full sweep) — identical association in the DuckDB twin, so
    bit-equal at every scale."""
    o = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    j = o.select(F.col("o_orderpriority").alias("prio"), cents.alias("c"))
    # widen to decimal BEFORE multiplying: c^3 overflows int64 at
    # cents magnitudes (5e7^3 ~ 1e23); decimal(38,0) products stay
    # exact to ~1e38
    cd = F.col("c").cast("decimal(38,0)")
    sums = j.groupBy("prio").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(cd * F.col("c")).alias("s2d"),
        F.sum(cd * F.col("c") * F.col("c")).alias("s3d"),
        F.sum(cd * F.col("c") * F.col("c") * F.col("c")).alias("s4d"),
    )

    # product sums cross 2^53 — the double conversion must be the
    # shared limb-exact helper (see _limb_exact_double; the sf0.1
    # full sweep caught the 5-LOW group's sums on a cast boundary)
    m = sums.select(
        "prio",
        "n",
        "s1",
        _limb_exact_double(F.col("s2d")).alias("s2"),
        _limb_exact_double(F.col("s3d")).alias("s3"),
        _limb_exact_double(F.col("s4d")).alias("s4"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    m2 = F.col("s2") / nd - mean * mean
    m3 = (
        F.col("s3") / nd
        - F.lit(3.0) * mean * (F.col("s2") / nd)
        + F.lit(2.0) * mean * mean * mean
    )
    m4 = (
        F.col("s4") / nd
        - F.lit(4.0) * mean * (F.col("s3") / nd)
        + F.lit(6.0) * mean * mean * (F.col("s2") / nd)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return m.select(
        "prio",
        F.col("n").alias("n_orders"),
        mean.alias("mean_cents"),
        (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("excess_kurtosis"),
    )


Q42_SQL = """
WITH j AS (
  SELECT o_orderpriority AS prio,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
), sums AS (
  SELECT prio, COUNT(*) AS n, SUM(c) AS s1,
    SUM(CAST(c AS HUGEINT) * c) AS s2r,
    SUM(CAST(c AS HUGEINT) * c * c) AS s3r,
    SUM(CAST(c AS HUGEINT) * c * c * c) AS s4r
  FROM j GROUP BY prio
), m AS (
  -- limb-exact integer->double (see the Spark twin's comment)
  SELECT prio, n, s1,
    ((CAST((((s2r - s2r % 1125899906842624) // 1125899906842624) - ((s2r - s2r % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((s2r - s2r % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(s2r % 1125899906842624 AS DOUBLE)) AS s2,
    ((CAST((((s3r - s3r % 1125899906842624) // 1125899906842624) - ((s3r - s3r % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((s3r - s3r % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(s3r % 1125899906842624 AS DOUBLE)) AS s3,
    ((CAST((((s4r - s4r % 1125899906842624) // 1125899906842624) - ((s4r - s4r % 1125899906842624) // 1125899906842624) % 1125899906842624) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 * 1125899906842624.0 + CAST(((s4r - s4r % 1125899906842624) // 1125899906842624) % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + CAST(s4r % 1125899906842624 AS DOUBLE)) AS s4
  FROM sums
)
SELECT prio, CAST(n AS BIGINT) AS n_orders,
  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
  ((s3 / CAST(n AS DOUBLE)
    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE)))
    + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
  / ((s2 / CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
     * SQRT(s2 / CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
  AS skewness,
  ((s4 / CAST(n AS DOUBLE)
    - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (s3 / CAST(n AS DOUBLE))
    + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE)))
    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
  / ((s2 / CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
     * (s2 / CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
  - 3.0 AS excess_kurtosis
FROM m
"""

QUERIES.append(
    Query(
        "q42_higher_moments",
        q42_higher_moments,
        Q42_SQL,
        "hash-exact skewness/kurtosis from decimal raw power sums",
    )
)

_GBA_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ALL
"""


def q43_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the every-non-aggregated-column shorthand both
    engines now share (DuckDB originated it; Spark adopted it): the
    IDENTICAL query text runs on both sides of the gate. Resolves to
    the same partial+final hash aggregate as an explicit column
    list."""
    from map_reduce_project_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)


QUERIES.append(
    Query(
        "q43_group_by_all",
        q43_group_by_all,
        _GBA_SQL,
        "GROUP BY ALL shorthand, identical query text on both engines",
    )
)



def _zorder_sql_expr(cols: list[str], bits: int) -> str:
    """The Morton interleave as portable ANSI arithmetic — generated
    from the same (bit, column) -> position rule as the engine-side
    expression tree, so the two can never drift."""
    n = len(cols)
    terms = [
        f"(({c} >> {b}) & 1) * {1 << (b * n + i)}"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return " + ".join(terms)


def q44_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering code under the exact gate: the
    bit-interleave of (o_custkey, o_orderkey) bucket ordinals — the
    layout primitive behind multi-column file pruning
    (operators/layout.py:zorder_layout range-partitions and sorts by
    this code; see the layout tests for the pruning property). The
    code is pure JVM shift/and arithmetic in one codegen stage, and
    the oracle reproduces it from the identical generated formula."""
    from map_reduce_project_spark.operators.layout import zorder_code
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(1024)).alias("x_bucket")
    y = F.pmod(F.col("o_orderkey"), F.lit(1024)).alias("y_bucket")
    return orders.select(
        "o_orderkey",
        x,
        y,
        zorder_code([F.pmod(F.col("o_custkey"), F.lit(1024)),
                     F.pmod(F.col("o_orderkey"), F.lit(1024))], bits=10)
        .cast("long")
        .alias("zcode"),
    )


Q44_SQL = f"""
SELECT o_orderkey,
  o_custkey % 1024 AS x_bucket,
  o_orderkey % 1024 AS y_bucket,
  CAST({_zorder_sql_expr(['(o_custkey % 1024)', '(o_orderkey % 1024)'], 10)}
       AS BIGINT) AS zcode
FROM orders
"""

QUERIES.append(
    Query(
        "q44_zorder_code",
        q44_zorder_code,
        Q44_SQL,
        "Z-order/Morton layout code (bit interleave, pure codegen arithmetic), oracle from the same generated formula",
    )
)


def q45_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4): props JSON parsed
    once into the binary variant encoding, fields extracted with
    variant_get path expressions — the schema-on-read shape for
    heterogeneous payloads at scale (parse once, extract many, no
    per-query JSON re-tokenization). try_variant_get on a missing
    path must yield NULL, not error."""
    from map_reduce_project_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").isNull().alias(
            "missing_null"
        ),
        F.schema_of_variant(v).alias("vschema"),
    )


Q45_SQL = """
SELECT event_id,
  json_extract(props, '$.k')::BIGINT AS k,
  json_extract_string(props, '$.k') AS k_str,
  json_extract(props, '$.missing') IS NULL AS missing_null,
  'OBJECT<k: BIGINT>' AS vschema
FROM events
"""

QUERIES.append(
    Query(
        "q45_variant",
        q45_variant,
        Q45_SQL,
        "VARIANT type: parse_json once, variant_get path extraction, try_variant_get null on missing path",
    )
)


def q46_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (DataFrame.stat.freqItems) under the
    exact gate via the superset contract: the sketch may return false
    positives but NEVER misses a true heavy hitter, so the gated rows
    are the EXACT heavy hitters (one shuffle groupBy at gate scale)
    each flagged with membership in the sketch result — a sketch that
    dropped one flips its flag and hash-mismatches the oracle's
    literal TRUE."""
    from map_reduce_project_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    support = 0.15
    sketch = set(
        ev.select(F.col("event_type").alias("et"))
        .stat.freqItems(["et"], support)
        .collect()[0][0]
    )
    total = ev.count()
    exact = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= support * total)
    )
    return exact.select(
        "event_type",
        "n",
        F.col("event_type").isin(sketch).alias("in_sketch"),
    )


Q46_SQL = """
SELECT event_type, COUNT(*) AS n, TRUE AS in_sketch
FROM events
GROUP BY event_type
HAVING COUNT(*) >= 0.15 * (SELECT COUNT(*) FROM events)
"""

QUERIES.append(
    Query(
        "q46_heavy_hitters",
        q46_heavy_hitters,
        Q46_SQL,
        "freqItems heavy-hitter sketch, no-false-negative contract checked against exact counts",
    )
)


def q47_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (the KLL/GK-style sketch for 100 TB
    percentiles) under the exact gate via its RANK-ERROR contract: the
    sketch guarantees the returned value's rank is within n/accuracy
    of the target rank. The engine counts the actual rank of the
    approximate answer and emits the bound verdict; the gated columns
    are exact-integer (group, n, verdict) so the sketch's
    engine-specific value never needs to match the oracle — only its
    contract does."""
    from map_reduce_project_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    accuracy = 1000
    approx = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", 0.5, accuracy
            ).alias("p50"),
            F.count("*").alias("n"),
        )
    )
    ranked = (
        li.join(approx, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("p50")).cast("long")
            ).alias("rank_of_approx"),
        )
    )
    return ranked.select(
        "l_returnflag",
        "n",
        (
            F.abs(F.col("rank_of_approx") - 0.5 * F.col("n"))
            <= F.col("n") / accuracy + 1
        ).alias("within_rank_bound"),
    )


Q47_SQL = """
SELECT l_returnflag, COUNT(*) AS n, TRUE AS within_rank_bound
FROM lineitem
GROUP BY l_returnflag
"""

QUERIES.append(
    Query(
        "q47_approx_percentile",
        q47_approx_percentile,
        Q47_SQL,
        "percentile_approx sketch checked via its rank-error contract (exact-integer verdict columns)",
    )
)


def pysource_telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 datasource API) under the
    exact gate: a registered ``DataSource`` class whose reader plans
    one InputPartition per split and generates rows task-side — the
    extensibility path for systems Spark has no built-in connector
    for. Row content is a deterministic 31-bit LCG of row_id, so the
    oracle rebuilds the identical table from generate_series."""
    from map_reduce_project_spark.sources.pydatasource import register

    register(spark)
    return (
        spark.read.format("synthetic_telemetry")
        .option("n_rows", 2000)
        .option("n_partitions", 8)
        .load()
    )


PYSOURCE_SQL = """
WITH g AS (SELECT range AS row_id FROM range(0, 2000)),
s AS (
  SELECT row_id,
    (row_id * 1103515245 + 12345) % 2147483648 AS x1
  FROM g
),
t AS (
  SELECT row_id, x1,
    (x1 * 1103515245 + 12345) % 2147483648 AS x2
  FROM s
)
SELECT row_id,
  x1 % 1000 AS device,
  CASE (x1 // 1000) % 4
    WHEN 0 THEN 'temp' WHEN 1 THEN 'rpm'
    WHEN 2 THEN 'volts' ELSE 'amps' END AS metric,
  x2 % 10000 AS reading
FROM t
"""

QUERIES.append(
    Query(
        "pysource_telemetry",
        pysource_telemetry,
        PYSOURCE_SQL,
        "custom Python DataSource (partition-parallel reader), rows oracle-rebuilt from the same LCG",
    )
)


def q48_merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (Delta/Iceberg-style CDC upsert) lowered to the
    DataFrame algebra Spark actually executes it as: one full-outer
    equi-join of target and source on the merge key, then per-row
    branch into update / keep / insert. Target = customers missing
    every 7th key (so some source keys genuinely insert); source =
    per-customer order totals. Money is exact int64 cents, so the
    merged balances hash-match the oracle.

    Scale: one shuffle per side on the merge key — the same physical
    plan a lakehouse MERGE runs before its file rewrite; AQE handles
    source-side skew, and a small CDC batch side should be broadcast
    (Catalyst does this automatically under the 10 MB threshold).
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")
    tgt = customer.where(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("tk"), cents("c_acctbal").alias("bal")
    )
    src = (
        orders.groupBy(F.col("o_custkey").alias("sk"))
        .agg(
            F.sum(cents("o_totalprice")).alias("delta"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    j = tgt.join(src, tgt.tk == src.sk, "full_outer")
    return j.select(
        F.coalesce(F.col("tk"), F.col("sk")).alias("custkey"),
        F.when(F.col("tk").isNotNull() & F.col("sk").isNotNull(), "update")
        .when(F.col("tk").isNotNull(), "keep")
        .otherwise("insert")
        .alias("action"),
        (
            F.coalesce(F.col("bal"), F.lit(0))
            + F.coalesce(F.col("delta"), F.lit(0))
        ).cast("long").alias("balance_cents"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
    )


Q48_SQL = """
WITH tgt AS (
  SELECT c_custkey AS tk,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
  FROM customer WHERE c_custkey % 7 <> 0
),
src AS (
  SELECT o_custkey AS sk,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS delta,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT COALESCE(tk, sk) AS custkey,
  CASE WHEN tk IS NOT NULL AND sk IS NOT NULL THEN 'update'
       WHEN tk IS NOT NULL THEN 'keep' ELSE 'insert' END AS action,
  CAST(COALESCE(bal, 0) + COALESCE(delta, 0) AS BIGINT) AS balance_cents,
  CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
FROM tgt FULL OUTER JOIN src ON tk = sk
"""

QUERIES.append(
    Query(
        "q48_merge_upsert",
        q48_merge_upsert_q,
        Q48_SQL,
        "MERGE INTO semantics as full-outer join + update/keep/insert branches, exact int64 cents",
    )
)


def q49_scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: rebuild a versioned history
    table from an ordered change stream. Each customer's orders become
    attribute versions; valid_from = the change timestamp, valid_to =
    the NEXT change's timestamp (NULL while current). One window over
    (key ORDER BY ts, tiebreak id) — a single shuffle on the dimension
    key, no self-join; this is the scalable form of the usual
    correlated-subquery SCD2 rebuild.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("long").alias("version"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


Q49_SQL = """
SELECT o_custkey AS custkey,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
  o_orderkey AS orderkey,
  o_orderpriority AS priority,
  o_orderdate AS valid_from,
  LEAD(o_orderdate) OVER w AS valid_to,
  LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

QUERIES.append(
    Query(
        "q49_scd2_history",
        q49_scd2_history_q,
        Q49_SQL,
        "SCD type-2 history rebuild: one window pass makes validity intervals from a change stream",
    )
)


def q50_window_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) OVER a running window — a documented Spark SQL
    gap (DISTINCT aggregates are unsupported in window frames) closed
    the idiomatic way: size(collect_set() OVER w). Running distinct
    part count per supplier over its lineitem sequence. The set rides
    the window state, so this is for bounded-cardinality distincts
    (parts per supplier); unbounded cardinality wants the two-level
    agg rewrite instead.
    """
    from pyspark.sql.window import Window

    li = read_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the generated data
    # (165 duplicate groups at sf0.01) — l_partkey totalizes the order
    # so the running frame is deterministic on both engines
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.size(F.collect_set("l_partkey").over(w))
        .cast("long")
        .alias("distinct_parts_so_far"),
    )


Q50_SQL = """
SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
  CAST(COUNT(DISTINCT l_partkey) OVER (
    PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_partkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS distinct_parts_so_far
FROM lineitem
"""

QUERIES.append(
    Query(
        "q50_window_count_distinct",
        q50_window_count_distinct_q,
        Q50_SQL,
        "running COUNT(DISTINCT) via collect_set window (Spark's distinct-in-frame gap closed)",
    )
)


def q51_hll_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's native Apache DataSketches HLL surface
    (hll_sketch_agg -> hll_sketch_estimate) under the CONTRACT gate:
    the sketch estimate must land within the configured relative
    error of the exact distinct (lgConfigK=12 -> ~1.6% rsd; gated at
    3x that). Output rows carry the exact count and the boolean
    verdict, so a broken sketch flips a flag and hash-mismatches the
    oracle's literal TRUE — sketch internals never need to match
    across engines. The sketch path is the 100 TB plan: mergeable
    per-partition state, one tiny binary per group crossing the wire
    (hll_union for multi-batch rollups).
    """
    cust = read_table(spark, sf_dir, "customer")
    both = cust.groupBy("c_mktsegment").agg(
        F.count_distinct("c_custkey").alias("exact_distinct"),
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg(c_custkey, 12))"
        ).alias("_est"),
    )
    bound = 0.05
    return both.select(
        "c_mktsegment",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(F.col("_est").cast("double") - F.col("exact_distinct").cast("double"))
            <= F.lit(bound) * F.col("exact_distinct").cast("double")
        ).alias("within_bound"),
    )


Q51_SQL = """
SELECT c_mktsegment,
  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
  TRUE AS within_bound
FROM customer GROUP BY c_mktsegment
"""

QUERIES.append(
    Query(
        "q51_hll_sketch",
        q51_hll_sketch_q,
        Q51_SQL,
        "Spark-native DataSketches HLL agg/estimate gated via the error-bound contract",
    )
)


SCD2_SPLIT = "1999-01-01"


def q52_scd2_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 maintenance, gated as equivalent to the full
    rebuild: the pre-split history is the existing dimension table, the
    post-split orders are the CDC batch, and the merge recomputes
    version chains ONLY for keys present in the batch — untouched
    keys' rows pass through byte-identical. The oracle is the FULL
    recompute over all orders, so the hash gate proves
    incremental == full — the invariant that makes partition-scoped
    reprocessing safe at 100 TB (you only ever pay for changed keys).
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    split = F.lit(SCD2_SPLIT).cast("timestamp")

    def scd2(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return df.select(
            F.col("o_custkey").alias("custkey"),
            F.row_number().over(w).cast("long").alias("version"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
            F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        )

    existing = scd2(orders.where(F.col("o_orderdate") < split))
    batch_keys = (
        orders.where(F.col("o_orderdate") >= split)
        .select(F.col("o_custkey").alias("custkey"))
        .dropDuplicates()
    )
    untouched = existing.join(batch_keys, "custkey", "left_anti")
    changed = scd2(
        orders.join(
            F.broadcast(batch_keys),
            orders.o_custkey == batch_keys.custkey,
            "left_semi",
        )
    )
    return untouched.unionAll(changed)


Q52_SQL = """
SELECT o_custkey AS custkey,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
  o_orderkey AS orderkey,
  o_orderpriority AS priority,
  o_orderdate AS valid_from,
  LEAD(o_orderdate) OVER w AS valid_to,
  LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

QUERIES.append(
    Query(
        "q52_scd2_incremental",
        q52_scd2_incremental_q,
        Q52_SQL,
        "incremental SCD2 merge (recompute changed keys only) hash-proven equal to the full rebuild",
    )
)


def q53_null_safe_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (<=>): match customers to orders on a
    nullable derived key where NULL must equal NULL — the semantics a
    plain equi-join silently drops (NULL = NULL is NULL, so null-keyed
    rows vanish). Spark's <=> is DuckDB's IS NOT DISTINCT FROM; both
    plan as a hash join with null-safe key comparison, not a cross.
    Keys: NULLIF(priority-band, 0) on both sides — band 0 rows carry
    NULL and still pair up.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    cband = F.expr("nullif(c_custkey % 5, 0)")
    oband = F.expr("nullif(o_custkey % 5, 0)")
    c = customer.select(
        F.col("c_custkey"), cband.alias("cband")
    ).where(F.col("c_custkey") <= 50)
    o = orders.select(
        F.col("o_orderkey"), F.col("o_custkey"), oband.alias("oband")
    ).where(F.col("o_custkey") <= 50)
    return (
        c.join(o, c.cband.eqNullSafe(o.oband))
        .groupBy("cband")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("cband"), F.lit(-1)).cast("long").alias("band"),
            "n_pairs",
            "n_customers",
            "n_orders",
        )
    )


Q53_SQL = """
WITH c AS (
  SELECT c_custkey, NULLIF(c_custkey % 5, 0) AS cband
  FROM customer WHERE c_custkey <= 50
),
o AS (
  SELECT o_orderkey, o_custkey, NULLIF(o_custkey % 5, 0) AS oband
  FROM orders WHERE o_custkey <= 50
)
SELECT CAST(COALESCE(cband, -1) AS BIGINT) AS band,
  COUNT(*) AS n_pairs,
  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM c JOIN o ON cband IS NOT DISTINCT FROM oband
GROUP BY cband
"""

QUERIES.append(
    Query(
        "q53_null_safe_join",
        q53_null_safe_join_q,
        Q53_SQL,
        "null-safe equality join (<=> / IS NOT DISTINCT FROM), NULL keys pair instead of vanishing",
    )
)


def q54_value_functions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window VALUE functions under the gate:
    first_value / last_value / nth_value over a running frame per
    customer's order history — cheapest/most-recent/second-ever order
    in one pass. The frame must be made explicit: last_value over the
    default frame is the running current row, a classic silent-wrong
    default both engines share.
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", cents.alias("cents")
    )
    running = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.first("cents").over(running).alias("first_cents"),
        F.last("cents").over(running).alias("latest_cents"),
        F.coalesce(
            F.nth_value("cents", 2).over(running), F.lit(-1)
        ).alias("second_cents"),
    )


Q54_SQL = """
SELECT o_custkey, o_orderkey,
  FIRST_VALUE(cents) OVER w AS first_cents,
  LAST_VALUE(cents) OVER w AS latest_cents,
  CAST(COALESCE(NTH_VALUE(cents, 2) OVER w, -1) AS BIGINT) AS second_cents
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

QUERIES.append(
    Query(
        "q54_value_functions",
        q54_value_functions_q,
        Q54_SQL,
        "first_value/last_value/nth_value with explicit running frames",
    )
)


def q55_rolling_7d_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based RANGE frame: each order's trailing-7-day revenue for
    its customer — the rolling-window shape behind velocity/fraud
    features. The frame is RANGE over epoch seconds (orders inside
    [t - 7d, t] by VALUE, not by row count — multiple same-week orders
    all land in each other's frames), with exact int64 cents.
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("ts_s"),
        cents.alias("cents"),
    )
    week = 7 * 24 * 3600
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts_s")
        .rangeBetween(-week, 0)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.sum("cents").over(w).alias("revenue_7d_cents"),
        F.count("*").over(w).cast("long").alias("n_orders_7d"),
    )


Q55_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(cents) OVER w AS BIGINT) AS revenue_7d_cents,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_7d
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(epoch(o_orderdate) AS BIGINT) AS ts_s,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_s
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
"""

QUERIES.append(
    Query(
        "q55_rolling_7d_revenue",
        q55_rolling_7d_revenue_q,
        Q55_SQL,
        "trailing-7-day revenue per customer via a time-valued RANGE frame, exact cents",
    )
)


def q56_grouping_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID over a cube: the bitmask that tells subtotal NULLs
    apart from real NULLs — without it a cube over nullable dims is
    ambiguous. Exact cents; grouping columns coalesced to sentinels
    keyed off the grouping bits, the canonical report shape.
    """
    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    cube = (
        orders.select("o_orderstatus", "o_orderpriority", cents.alias("cents"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.count("*").cast("long").alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )
    return cube.select(
        F.coalesce(
            F.col("o_orderstatus"),
            F.when(F.col("gid").bitwiseAND(2) > 0, "ALL"),
        ).alias("status"),
        F.coalesce(
            F.col("o_orderpriority"),
            F.when(F.col("gid").bitwiseAND(1) > 0, "ALL"),
        ).alias("priority"),
        "gid",
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        "n",
    )


Q56_SQL = """
SELECT
  COALESCE(o_orderstatus,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' END) AS status,
  COALESCE(o_orderpriority,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' END) AS priority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
    AS revenue_cents,
  COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

QUERIES.append(
    Query(
        "q56_grouping_id",
        q56_grouping_id_q,
        Q56_SQL,
        "CUBE with GROUPING_ID bitmask disambiguating subtotal rows",
    )
)


def q61_agg_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining aggregate-surface functions under the gate:
    count_if, bool_and/bool_or (every/any), and any_value made
    deterministic (min_by stands in — any_value's nondeterminism is
    exactly what a hash gate won't tolerate, so the deterministic
    twin is the right engine default anyway)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("count_if(o_totalprice > 100000)").cast("long").alias("n_big"),
        F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
        F.expr("bool_or(o_orderpriority = '1-URGENT')").alias("any_urgent"),
        F.expr("min_by(o_orderpriority, o_orderkey)").alias(
            "first_priority_by_key"
        ),
    )


Q61_SQL = """
SELECT o_orderstatus,
  CAST(COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS BIGINT) AS n_big,
  BOOL_AND(o_totalprice > 0) AS all_positive,
  BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
  MIN_BY(o_orderpriority, o_orderkey) AS first_priority_by_key
FROM orders
GROUP BY o_orderstatus
"""

QUERIES.append(
    Query(
        "q61_agg_surface",
        q61_agg_surface_q,
        Q61_SQL,
        "count_if / bool_and / bool_or / deterministic any_value aggregate surface",
    )
)


def q63_latest_snapshot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key compaction (the QUALIFY row_number() = 1
    idiom): each customer's most recent order is the current state —
    the read pattern over every CDC/append table before it is
    compacted. One rank window per key, deterministic tiebreak.
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_orderstatus",
            "o_orderpriority",
        )
    )


Q63_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus, o_orderpriority
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
         ORDER BY o_orderdate DESC, o_orderkey DESC) AS r
  FROM orders
) WHERE r = 1
"""

QUERIES.append(
    Query(
        "q63_latest_snapshot",
        q63_latest_snapshot_q,
        Q63_SQL,
        "latest-row-per-key compaction (QUALIFY idiom): current state from an append log",
    )
)


def sketch_count_min_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over event users: build
    the 4x64 integer table in one distributed pass
    (operators/sketches.py — the partial+final agg IS the sketch
    merge), then point-estimate every 25th user against it and join
    the exact counts back. The sketch is bit-exact cross-engine (md5
    cell arithmetic), so the gate hashes the ESTIMATES, not just a
    bound; ``never_undercounts`` pins the CM guarantee row by row.
    """
    from map_reduce_project_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    ev = read_table(spark, sf_dir, "events")
    cm = count_min_table(ev, "user_id", depth=4, width=64)
    probes = (
        ev.where(F.col("user_id") % 25 == 0)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    est = count_min_estimate(cm, probes, "user_id", depth=4, width=64)
    return est.select(
        "user_id",
        "true_n",
        "cm_est",
        (F.col("cm_est") >= F.col("true_n")).alias("never_undercounts"),
    )


SKETCH_CM_SQL = """
WITH d(d) AS (VALUES (0), (1), (2), (3)),
cells AS (
  SELECT d.d AS d,
         ('0x' || substr(md5('cm' || d.d || '|' || user_id), 1, 8))::BIGINT
           % 64 AS col,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events CROSS JOIN d
  GROUP BY 1, 2
),
probes AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events WHERE user_id % 25 = 0 GROUP BY 1
)
SELECT p.user_id, p.true_n, CAST(MIN(c.cnt) AS BIGINT) AS cm_est,
       MIN(c.cnt) >= p.true_n AS never_undercounts
FROM probes p
CROSS JOIN d
JOIN cells c
  ON c.d = d.d
 AND c.col = ('0x' || substr(md5('cm' || d.d || '|' || p.user_id), 1, 8))::BIGINT % 64
GROUP BY 1, 2
"""

QUERIES.append(
    Query(
        "sketch_count_min",
        sketch_count_min_q,
        SKETCH_CM_SQL,
        "count-min table + point estimates vs exact counts, sketch bit-exact",
    )
)


def pysource_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING custom Python Data Source under the exact gate: the
    same registered source read via ``readStream`` — the
    partition-planned DataSourceStreamReader walks its offset forward
    rows_per_batch at a time (8 genuine microbatches for 2000 rows),
    each batch split into task-side partition reads, appended to a
    memory sink until the stream drains. The final table must equal
    the batch reader's output row-for-row, so the SAME LCG oracle
    gates both entry points."""
    import time
    import uuid

    from map_reduce_project_spark.sources.pydatasource import register

    register(spark)
    n_rows = 2000
    name = f"pys_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("synthetic_telemetry")
        .option("n_rows", n_rows)
        .option("rows_per_batch", 250)
        .option("n_partitions", 4)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= n_rows:
                break
            time.sleep(0.3)
        else:
            # raise loudly instead of returning a partial table — a
            # stalled reader would otherwise surface downstream as an
            # opaque gate hash mismatch and be misdiagnosed as a
            # correctness bug in the source
            got = spark.table(name).count()
            raise TimeoutError(
                f"pysource stream stalled: {got}/{n_rows} rows after 120s"
            )
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name)


QUERIES.append(
    Query(
        "pysource_stream",
        pysource_stream_q,
        PYSOURCE_SQL,
        "streaming Python DataSource (offset-walked microbatches) vs the same LCG oracle",
    )
)


def sketch_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter extraction THROUGH the count-min sketch — the
    serving pattern the CM table exists for: estimate every distinct
    token of the corpus against the broadcast 4x16 table and keep the
    ones whose estimate clears 1/30 of total token mass. The CM
    never-undercounts guarantee makes the result a provable SUPERSET
    of the true heavy hitters (every true HH is present;
    ``is_true_hh`` exposes the collision-driven false-positive tail,
    the price of a constant-size sketch — the 4x16 sizing is
    deliberately tight so BOTH verdict kinds appear at gate scale).
    The threshold test is exact integer cross-multiplication
    (est*30 >= total), and the sketch is md5-bit-exact cross-engine,
    so the whole verdict set is hash-gated."""
    from map_reduce_project_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    total = toks.count()
    cm = count_min_table(toks, "term", depth=4, width=16)
    exact = toks.groupBy("term").agg(F.count("*").cast("long").alias("true_n"))
    est = count_min_estimate(cm, exact, "term", depth=4, width=16)
    return est.where(F.col("cm_est") * 30 >= total).select(
        "term",
        "cm_est",
        "true_n",
        (F.col("true_n") * 30 >= total).alias("is_true_hh"),
    )


SKETCH_HH_SQL = """
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
),
total AS (SELECT COUNT(*) AS n FROM toks),
d(d) AS (VALUES (0), (1), (2), (3)),
cells AS (
  SELECT d.d AS d,
         ('0x' || substr(md5('cm' || d.d || '|' || term), 1, 8))::BIGINT
           % 16 AS col,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN d
  GROUP BY 1, 2
),
exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS true_n FROM toks GROUP BY 1
),
est AS (
  SELECT e.term, e.true_n, CAST(MIN(c.cnt) AS BIGINT) AS cm_est
  FROM exact e
  CROSS JOIN d
  JOIN cells c
    ON c.d = d.d
   AND c.col = ('0x' || substr(md5('cm' || d.d || '|' || e.term), 1, 8))::BIGINT % 16
  GROUP BY 1, 2
)
SELECT term, cm_est, true_n,
       true_n * 30 >= (SELECT n FROM total) AS is_true_hh
FROM est
WHERE cm_est * 30 >= (SELECT n FROM total)
"""

QUERIES.append(
    Query(
        "sketch_heavy_hitters",
        sketch_heavy_hitters_q,
        SKETCH_HH_SQL,
        "CM-sketch heavy hitters: provable superset of true >=1/30-mass tokens",
    )
)


def pysource_write_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITER side of the custom Python Data Source under the
    exact gate: 2000 telemetry rows go out through
    ``df.write.format("synthetic_telemetry")`` — per-task JSONL files
    with two-phase commit (tasks write ``.tmp`` + return commit
    messages; only driver ``commit()`` renames them visible, the
    exactly-once seam every real table format implements) — and come
    back via ``spark.read.json`` to be hashed against the same LCG
    oracle as the reader queries. Completes the DataSource API
    matrix: batch read + partition-planned stream read + committed
    write."""
    import shutil
    import tempfile

    from map_reduce_project_spark.sources.pydatasource import (
        SCHEMA_DDL,
        register,
    )

    register(spark)
    out_dir = tempfile.mkdtemp(prefix="pys_write_")
    try:
        src = (
            spark.read.format("synthetic_telemetry")
            .option("n_rows", 2000)
            .option("n_partitions", 4)
            .load()
        )
        src.write.format("synthetic_telemetry").option(
            "path", out_dir
        ).mode("append").save()
        back = (
            spark.read.schema(SCHEMA_DDL)
            .json(f"{out_dir}/*.jsonl")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return back


QUERIES.append(
    Query(
        "pysource_write_roundtrip",
        pysource_write_roundtrip_q,
        PYSOURCE_SQL,
        "custom DataSource writer (2-phase commit JSONL) round trip vs LCG oracle",
    )
)


def q87_join_ivm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance hash-proven equal to the full
    rebuild — the delta rule every streaming/materialized-view engine
    implements: with base tables split into old + delta (orders and
    lineitem arriving after '2001-06-01' are "today's batch"),
    new(R join S) = old_R join old_S  UNION ALL  dR join old_S
    UNION ALL  old_R join dS  UNION ALL  dR join dS — three
    delta-sized joins instead of one full re-join. The gate compares
    the UNION of the four terms against the oracle's plain full join
    (per-key revenue agg on top so the result is small and
    order-free); any missing/duplicated delta term is a hash
    mismatch. At 100 TB the three delta joins touch only the new
    partitions plus index lookups into the old side — the difference
    between a nightly full re-join and minutes."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cut = F.lit("2001-06-01")
    o_old, o_new = orders.where(F.col("o_orderdate") < cut), orders.where(
        F.col("o_orderdate") >= cut
    )
    l_old, l_new = li.where(F.col("l_shipdate") < cut), li.where(
        F.col("l_shipdate") >= cut
    )
    cond = F.col("o_orderkey") == F.col("l_orderkey")
    joined = (
        o_old.join(l_old, cond)
        .unionByName(o_new.join(l_old, cond))
        .unionByName(o_old.join(l_new, cond))
        .unionByName(o_new.join(l_new, cond))
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


Q87_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q87_join_ivm",
        q87_join_ivm_q,
        Q87_SQL,
        "join IVM delta rule (old+delta split, 4 terms) == full re-join",
    )
)


def q88_agg_ivm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental AGGREGATE maintenance: the materialized per-nation
    revenue rollup is maintained by MERGING the old aggregate state
    with the delta batch's partial aggregate (sums and counts add;
    no rescan of history), hash-proven equal to the full rebuild.
    This is the self-maintainable-aggregate property (SUM/COUNT need
    no base access; MIN/MAX under deletes would) that makes streaming
    rollups and OLAP cubes cheap to keep fresh."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cut = F.lit("2001-06-01")
    base = orders.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.col("o_orderdate"),
    )

    def agg(df):
        return df.groupBy("nationkey").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("p").alias("s"),
        )

    old_state = agg(base.where(F.col("o_orderdate") < cut))
    delta = agg(base.where(F.col("o_orderdate") >= cut))
    merged = (
        old_state.unionByName(delta)
        .groupBy("nationkey")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("s").cast("double").alias("total_revenue"),
        )
    )
    return merged


Q88_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q88_agg_ivm",
        q88_agg_ivm_q,
        Q88_SQL,
        "aggregate IVM: old state merged with delta partials == full rebuild",
    )
)


def q92_hll_union_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketch rollup — the incremental-pipeline contract that
    makes distinct-count maintainable at 100 TB: per-day partial HLL
    sketches (one tiny binary per (event_type, day) group) merged with
    ``hll_union_agg`` into a global estimate WITHOUT revisiting raw
    rows. q51 gates the one-shot sketch; this gates the union path —
    the estimate from merged partials must land within the error bound
    of the exact global distinct, so a broken merge (e.g. one that
    double-biases registers) flips the verdict and hash-mismatches the
    oracle's literal TRUE. Daily partials are exactly what a streaming
    or partition-incremental rollup would persist; the union is
    associative, so any re-aggregation topology gives the same answer.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_partials"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("_est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    bound = 0.05
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_partials",
        "exact_distinct",
        (
            F.abs(
                F.col("_est").cast("double")
                - F.col("exact_distinct").cast("double")
            )
            <= F.lit(bound) * F.col("exact_distinct").cast("double")
        ).alias("within_bound"),
    )


Q92_SQL = """
SELECT event_type,
  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_partials,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
  TRUE AS within_bound
FROM events GROUP BY event_type
"""

QUERIES.append(
    Query(
        "q92_hll_union",
        q92_hll_union_q,
        Q92_SQL,
        "per-day HLL partials merged via hll_union_agg, estimate gated within the error bound of exact",
    )
)


def q94_sql_udf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ...
    RETURNS ... RETURN expr``) — reusable expression logic that lives
    in the catalog, planned INLINE by Catalyst exactly like the
    written-out expression (no UDF boundary, full codegen/pushdown).
    Two functions compose (a banding function and a priority-weighted
    margin); the oracle inlines the same expressions, so a change in
    how Spark expands SQL UDFs is a hash mismatch. Sum rides the
    decimal cast per the float-agg discipline."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q94_orders"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q94_band(x DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN x < 50000 THEN 'low' "
        "WHEN x < 150000 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q94_margin(x DOUBLE, "
        "p STRING) RETURNS DOUBLE RETURN "
        "CASE WHEN p = '1-URGENT' THEN x * 2 ELSE x END"
    )
    return spark.sql(
        """
SELECT q94_band(o_totalprice) AS band,
  COUNT(*) AS n,
  CAST(SUM(CAST(q94_margin(o_totalprice, o_orderpriority)
                AS DECIMAL(18,2))) AS DOUBLE) AS weighted_value
FROM q94_orders
GROUP BY 1
"""
    )


Q94_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band,
  COUNT(*) AS n,
  CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN o_totalprice * 2
                     ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS weighted_value
FROM orders
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q94_sql_udf",
        q94_sql_udf_q,
        Q94_SQL,
        "catalog-resident SQL scalar functions, inlined by Catalyst, vs the written-out oracle",
    )
)


def q95_collation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATIONS: case-insensitive comparison via
    UTF8_LCASE — predicates written against mixed-case literals match
    without wrapping every column in lower() (and, at scale, without
    breaking pushdown the way expression-wrapped columns can). The
    oracle lowers both sides explicitly; equal counts pin the
    collated semantics."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "q95_customer"
    )
    return spark.sql(
        """
SELECT
  COUNT(*) AS n_all,
  COUNT(*) FILTER (
    WHERE c_mktsegment COLLATE UTF8_LCASE = 'bUiLdInG'
  ) AS n_building_ci,
  COUNT(*) FILTER (
    WHERE startswith(c_name COLLATE UTF8_LCASE, 'cUsToMeR#')
  ) AS n_name_prefix_ci
FROM q95_customer
"""
    )


Q95_SQL = """
SELECT COUNT(*) AS n_all,
  COUNT(*) FILTER (WHERE lower(c_mktsegment) = 'building')
    AS n_building_ci,
  COUNT(*) FILTER (WHERE lower(c_name) LIKE 'customer#%')
    AS n_name_prefix_ci
FROM customer
"""

QUERIES.append(
    Query(
        "q95_collation",
        q95_collation_q,
        Q95_SQL,
        "UTF8_LCASE collated comparisons vs explicit lower() oracle",
    )
)


def q96_try_arithmetic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` error-absorbing arithmetic family under ANSI
    mode: try_divide (NULL on zero divisor), try_cast (NULL on
    malformed input), try_add (NULL on int64 overflow) — the
    functions that keep a 100 TB job from dying on the one bad row
    while staying ANSI-strict everywhere else. The oracle reproduces
    each NULL contract with explicit CASE/TRY_CAST; double quotients
    of exact ints are IEEE-identical cross-engine, summed via the
    decimal cast."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q96_orders"
    )
    return spark.sql(
        """
SELECT o_orderpriority,
  COUNT(*) AS n,
  COUNT(*) FILTER (
    WHERE try_divide(o_orderkey, o_orderkey % 7) IS NULL
  ) AS n_div_null,
  CAST(SUM(CAST(try_divide(o_orderkey, o_orderkey % 7)
                AS DECIMAL(28,6))) AS DOUBLE) AS sum_quot,
  COUNT(try_cast(o_orderpriority AS INT)) AS n_cast_ok,
  COUNT(try_add(9223372036854775807, o_orderkey)) AS n_add_ok
FROM q96_orders
GROUP BY o_orderpriority
"""
    )


Q96_SQL = """
SELECT o_orderpriority,
  COUNT(*) AS n,
  COUNT(*) FILTER (WHERE o_orderkey % 7 = 0) AS n_div_null,
  CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE CAST(CAST(o_orderkey AS DOUBLE)
                          / (o_orderkey % 7) AS DECIMAL(28,6))
           END) AS DOUBLE) AS sum_quot,
  COUNT(TRY_CAST(o_orderpriority AS INT)) AS n_cast_ok,
  COUNT(*) FILTER (WHERE o_orderkey = 0) AS n_add_ok
FROM orders
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q96_try_arithmetic",
        q96_try_arithmetic_q,
        Q96_SQL,
        "try_divide/try_cast/try_add NULL contracts vs explicit CASE oracle",
    )
)


def q97_sql_tvf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE-VALUED function (Spark 4 ``CREATE FUNCTION ...
    RETURNS TABLE``) — a parameterized view in the catalog, planned
    inline like any subquery (no UDTF boundary, full pushdown into
    the scan). The caller aggregates over the TVF at one threshold;
    the oracle writes the WHERE out by hand."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q97_orders"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q97_big_orders(thr DOUBLE) "
        "RETURNS TABLE (o_orderpriority STRING, o_totalprice DOUBLE) "
        "RETURN SELECT o_orderpriority, o_totalprice FROM q97_orders "
        "WHERE o_totalprice > thr"
    )
    return spark.sql(
        """
SELECT o_orderpriority, COUNT(*) AS n_big,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM q97_big_orders(250000.0D)
GROUP BY o_orderpriority
"""
    )


Q97_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_big,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice > 250000.0
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q97_sql_tvf",
        q97_sql_tvf_q,
        Q97_SQL,
        "catalog-resident SQL table-valued function (parameterized view) vs hand-written WHERE",
    )
)


def q98_bitmap_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct-count via the bitmap aggregate family
    (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the
    deterministic counterpart to the HLL rollup (q92): per-month
    partial bitmaps are OR-merged across months, then counted, and
    the result is not an estimate — it EQUALS count_distinct, so the
    gate needs no tolerance verdict. This is how a 100 TB pipeline
    maintains incremental exact distincts: one small bitmap per
    (group, bucket) partition crossing the wire, re-mergeable under
    any re-aggregation topology."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q98_orders"
    )
    return spark.sql(
        """
SELECT o_orderpriority,
  CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_custs
FROM (
  SELECT o_orderpriority, bkt, bitmap_or_agg(bm) AS bm
  FROM (
    SELECT o_orderpriority,
           date_trunc('month', o_orderdate) AS mon,
           bitmap_bucket_number(o_custkey) AS bkt,
           bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
    FROM q98_orders
    GROUP BY 1, 2, 3
  )
  GROUP BY 1, 2
)
GROUP BY o_orderpriority
"""
    )


Q98_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_custs
FROM orders
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q98_bitmap_distinct",
        q98_bitmap_distinct_q,
        Q98_SQL,
        "exact mergeable distinct via bitmap partials OR-merged across months == count_distinct",
    )
)


def q99_parameterized_sql_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named parameter markers + the
    IDENTIFIER clause): values bind as literals and the table name
    binds through IDENTIFIER() — the injection-safe templating path
    for programmatic query construction (string-splicing a filter
    value into SQL text is the 100 TB pipeline's classic foot-gun).
    The oracle is the fully resolved query text."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q99_orders"
    )
    return spark.sql(
        """
SELECT o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM IDENTIFIER(:tbl)
WHERE o_orderdate >= :lo AND o_orderstatus = :status
GROUP BY o_orderpriority
""",
        args={"tbl": "q99_orders", "lo": "1997-01-01", "status": "O"},
    )


Q99_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= '1997-01-01' AND o_orderstatus = 'O'
GROUP BY o_orderpriority
"""

QUERIES.append(
    Query(
        "q99_parameterized_sql",
        q99_parameterized_sql_q,
        Q99_SQL,
        "named parameter markers + IDENTIFIER clause vs the resolved query text",
    )
)


def q100_snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF — the table-version comparison behind lakehouse
    audits and CDC backfills: given two versions of the orders
    dimension (pre/post a cutoff date standing in for two snapshots,
    with the post version also re-pricing urgent orders), classify
    every key as added / removed / changed / unchanged and count each
    class. Implemented as one full-outer join on the key comparing
    null-safe row fingerprints (md5 over the concatenated tracked
    columns — the same fingerprint both engines can compute); exact
    counts."""
    orders = read_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderdate") < "1997-06-01")
    new = orders.where(F.col("o_orderdate") >= "1995-06-01").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.round(F.col("o_totalprice") * F.lit(2), 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                )
            ).alias("fp"),
        )

    o, n = fp(old).alias("o"), fp(new).alias("n")
    classified = o.join(
        n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    ).select(
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .when(F.col("o.fp") != F.col("n.fp"), "changed")
        .otherwise("unchanged")
        .alias("change")
    )
    return classified.groupBy("change").agg(
        F.count("*").cast("long").alias("n_keys")
    )


Q100_SQL = """
WITH old AS (
  SELECT o_orderkey,
    md5(o_orderstatus || '|' ||
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS fp
  FROM orders WHERE o_orderdate < '1997-06-01'
),
new AS (
  SELECT o_orderkey,
    md5(o_orderstatus || '|' ||
        CAST(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                       THEN ROUND(o_totalprice * 2, 2)
                       ELSE o_totalprice END AS DECIMAL(18,2)) AS VARCHAR)) AS fp
  FROM orders WHERE o_orderdate >= '1995-06-01'
)
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed'
            ELSE 'unchanged' END AS change,
  CAST(COUNT(*) AS BIGINT) AS n_keys
FROM old o FULL OUTER JOIN new n USING (o_orderkey)
GROUP BY 1
"""

QUERIES.append(
    Query(
        "q100_snapshot_diff",
        q100_snapshot_diff_q,
        Q100_SQL,
        "snapshot diff: added/removed/changed/unchanged via full-outer fingerprint join",
    )
)


def q101_approx_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` under its CONTRACT (the q46/q47 sketch
    discipline): with maxItemsTracked >= the column's distinct
    cardinality the sketch degenerates to exact counting, so the
    top-3 (item, count) rows must EQUAL the exact ones — and the
    fixture's event-type counts are strictly distinct at every gate
    SF, so rank order is deterministic too. At real scale the same
    call is one mergeable sketch per partition; this pins the
    degenerate-exact tier the way q23 pins HLL."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView(
        "q101_events"
    )
    return spark.sql(
        """
SELECT pos + 1 AS rnk, e.item AS event_type,
       CAST(e.count AS BIGINT) AS n
FROM (SELECT approx_top_k(event_type, 3, 10000) AS tk FROM q101_events)
LATERAL VIEW posexplode(tk) AS pos, e
"""
    )


Q101_SQL = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC) AS BIGINT) AS rnk,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC
LIMIT 3
"""

QUERIES.append(
    Query(
        "q101_approx_topk",
        q101_approx_topk_q,
        Q101_SQL,
        "approx_top_k degenerate-exact contract: top-3 equals exact when the sketch covers the cardinality",
    )
)


def q102_expectations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality EXPECTATIONS evaluated in one pass —
    the dbt-test/Great-Expectations pattern as a single conditional
    aggregate over the scan plus one distinct-count and one anti-join
    probe: not-null rate, domain membership, range check, key
    uniqueness, and referential integrity each emit
    (expectation, n_violations, passed). All counts exact; one row
    per expectation via an explicit stack, so adding a rule never
    changes existing rows."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    base = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_null_cust"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_status_domain"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("v_price_range"),
        (F.count("*") - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("v_key_dupes"),
    )
    orphans = (
        orders.join(
            cust,
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("v_orphans"))
    )
    both = base.crossJoin(orphans)  # two 1-row aggregates
    stacked = both.selectExpr(
        """stack(5,
          'custkey_not_null', v_null_cust,
          'status_in_domain', v_status_domain,
          'price_positive', v_price_range,
          'orderkey_unique', v_key_dupes,
          'custkey_references_customer', v_orphans
        ) AS (expectation, n_violations)"""
    )
    return stacked.select(
        "expectation",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


Q102_SQL = """
WITH base AS (
  SELECT
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS v_null_cust,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain,
    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS v_price_range,
    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_key_dupes
  FROM orders
),
orph AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_orphans
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_custkey IS NULL
),
stacked AS (
  SELECT 'custkey_not_null' AS expectation, v_null_cust AS n_violations
    FROM base
  UNION ALL
  SELECT 'status_in_domain', v_status_domain FROM base
  UNION ALL
  SELECT 'price_positive', v_price_range FROM base
  UNION ALL
  SELECT 'orderkey_unique', v_key_dupes FROM base
  UNION ALL
  SELECT 'custkey_references_customer', v_orphans FROM orph
)
SELECT expectation, n_violations, n_violations = 0 AS passed
FROM stacked
"""

QUERIES.append(
    Query(
        "q102_expectations",
        q102_expectations_q,
        Q102_SQL,
        "declarative data-quality expectations: null/domain/range/uniqueness/referential in one pass",
    )
)


def q103_listagg_mode_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set / ordered-string aggregates (round 7): LISTAGG
    WITHIN GROUP (new SQL:2016 surface in Spark 4), MODE, and MEDIAN
    per order priority. Determinism rules: listagg aggregates the
    DISTINCT order statuses under an explicit ORDER BY (unordered
    listagg is nondeterministic by definition); the mode is computed by an
    explicit (count DESC, status ASC) rank — the engines' native
    mode() tie rules differ, so the query pins its own; median over an int column is exact rational -> one double.
    One partial+final agg pass; the listagg input is the tiny
    distinct set, never the raw rows."""
    return spark.sql(
        f"""
WITH o AS (SELECT * FROM parquet.`{sf_dir}/orders.parquet`),
st AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM o GROUP BY 1, 2
),
md AS (
  SELECT o_orderpriority, o_orderstatus AS mode_status
  FROM (
    SELECT o_orderpriority, o_orderstatus,
      row_number() OVER (
        PARTITION BY o_orderpriority ORDER BY n DESC, o_orderstatus
      ) AS rk
    FROM st
  ) ranked WHERE rk = 1
)
SELECT s.o_orderpriority,
  listagg(DISTINCT s.o_orderstatus, '|')
    WITHIN GROUP (ORDER BY s.o_orderstatus) AS statuses,
  md.mode_status,
  CAST(median(k.o_orderkey % 100000 + k.o_custkey % 1000) AS DOUBLE)
    AS median_key
FROM st s
JOIN md ON md.o_orderpriority = s.o_orderpriority
JOIN o k ON k.o_orderpriority = s.o_orderpriority
GROUP BY s.o_orderpriority, md.mode_status
"""
    )


Q103_SQL = """
WITH st AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
md AS (
  SELECT o_orderpriority, o_orderstatus AS mode_status
  FROM (
    SELECT o_orderpriority, o_orderstatus,
      row_number() OVER (
        PARTITION BY o_orderpriority ORDER BY n DESC, o_orderstatus
      ) AS rk
    FROM st
  ) ranked WHERE rk = 1
)
SELECT s.o_orderpriority,
  listagg(DISTINCT s.o_orderstatus, '|' ORDER BY s.o_orderstatus)
    AS statuses,
  md.mode_status,
  CAST(median(k.o_orderkey % 100000 + k.o_custkey % 1000) AS DOUBLE)
    AS median_key
FROM st s
JOIN md ON md.o_orderpriority = s.o_orderpriority
JOIN orders k ON k.o_orderpriority = s.o_orderpriority
GROUP BY s.o_orderpriority, md.mode_status
"""

QUERIES.append(
    Query(
        "q103_listagg_mode_median",
        q103_listagg_mode_median_q,
        Q103_SQL,
        "ordered-set aggregates: LISTAGG WITHIN GROUP + tie-pinned mode + exact median",
    )
)


def _hilbert_unrolled_sql(bits: int) -> str:
    """The xy2d recurrence unrolled as nested subselects — the oracle
    twin of operators/layout.py:with_hilbert_code (same per-level
    reflect-then-swap frame transform, same digit weights)."""
    sql = (
        "SELECT o_orderkey, o_custkey % {m} AS xb, o_orderkey % {m} AS yb,"
        " o_custkey % {m} AS hx, o_orderkey % {m} AS hy,"
        " CAST(0 AS BIGINT) AS hd FROM orders"
    ).format(m=1 << bits)
    for s in (1 << b for b in reversed(range(bits))):
        sql = f"""
SELECT o_orderkey, xb, yb,
  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - hy ELSE hy END)
       ELSE hx END AS hx,
  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - hx ELSE hx END)
       ELSE hy END AS hy,
  hd + {s * s} * xor(3 * rx, ry) AS hd
FROM (
  SELECT o_orderkey, xb, yb, hx, hy, hd,
    CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
    CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
  FROM ({sql})
)"""
    return (
        f"SELECT o_orderkey, xb AS x_bucket, yb AS y_bucket,"
        f" CAST(hd AS BIGINT) AS hcode FROM ({sql})"
    )


def q104_hilbert_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering code under the exact gate (round 7):
    the continuous companion of q44's Z-order — consecutive codes are
    always Manhattan-adjacent cells (pinned by the layout tests), so
    equal code ranges cover tighter min/max boxes and files prune
    better on BOTH clustered columns. The unrolled xy2d levels are
    plain CASE/AND arithmetic in named projections (whole-stage
    codegen, linear expression growth); the oracle replays the
    identical recurrence from generated SQL."""
    from map_reduce_project_spark.operators.layout import with_hilbert_code

    orders = read_table(spark, sf_dir, "orders")
    side = 1 << 8
    base = orders.select(
        "o_orderkey",
        F.pmod(F.col("o_custkey"), F.lit(side)).alias("x_bucket"),
        F.pmod(F.col("o_orderkey"), F.lit(side)).alias("y_bucket"),
    )
    return with_hilbert_code(
        base, "x_bucket", "y_bucket", bits=8, out_col="hcode"
    ).select(
        "o_orderkey",
        F.col("x_bucket").cast("long").alias("x_bucket"),
        F.col("y_bucket").cast("long").alias("y_bucket"),
        "hcode",
    )


Q104_SQL = _hilbert_unrolled_sql(bits=8)

QUERIES.append(
    Query(
        "q104_hilbert_code",
        q104_hilbert_code,
        Q104_SQL,
        "Hilbert-curve layout code (continuous space-filling index), oracle from the same unrolled recurrence",
    )
)


def q105_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink/source format-fidelity under the exact gate (round 7,
    SURVEY §2 O12): the orders table round-trips through CSV, JSON,
    and ORC sinks (sources/io.py write_*/read_* — CSV re-read with
    the explicit schema, the format's real-world contract since CSV
    carries no types), and a per-format aggregate over the re-read
    copies must hash-match the oracle computed on the ORIGINAL
    parquet — so a date that shifted in CSV serialization, a decimal
    that lost scale in JSON, or a status string that picked up
    quoting damage moves a sum. The interesting seams this pins:
    date <-> ISO-8601 text round trips, DECIMAL(18,2) exactness
    through text formats, and ORC's typed fidelity."""
    import tempfile

    from map_reduce_project_spark.sources.io import (
        read_csv,
        read_json,
        read_orc,
        write_csv,
        write_json,
        write_orc,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    import glob
    import os
    import shutil

    # Temp-dir hygiene WITHOUT eagerly collecting: the returned plan
    # must stay live (the caller collects it, and the plan-shape
    # census pins its 3-scan signature), so THIS run's directory
    # cannot be deleted here — instead each invocation sweeps STALE
    # q105_fmt_* leftovers, bounding orphaned temp data across
    # repeated gate/bench/census runs. Only dirs older than 2 hours
    # are removed: a concurrent census/bench session (the documented
    # multi-session workflow) may have a LIVE roundtrip directory
    # between its write and collect, and sweeping it would fail that
    # session's gate spuriously.
    import time

    cutoff = time.time() - 2 * 3600
    for stale in glob.glob(
        os.path.join(tempfile.gettempdir(), "q105_fmt_*")
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass
    base = tempfile.mkdtemp(prefix="q105_fmt_")
    write_csv(orders, f"{base}/csv")
    write_json(orders, f"{base}/json")
    write_orc(orders, f"{base}/orc")
    ddl = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice decimal(18,2), o_orderdate date, "
        "o_orderpriority string"
    )
    rereads = {
        "csv": read_csv(spark, f"{base}/csv", schema=ddl),
        "json": read_json(spark, f"{base}/json", schema=ddl),
        "orc": read_orc(spark, f"{base}/orc"),
    }
    parts = []
    for fmt, df in rereads.items():
        parts.append(
            df.agg(
                F.lit(fmt).alias("fmt"),
                F.count("*").cast("long").alias("n"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.cast(
                    "double", F.sum("o_totalprice")
                ).alias("sum_price"),
                F.sum(F.datediff("o_orderdate", F.lit("1990-01-01")))
                .cast("long")
                .alias("sum_datediff"),
                F.sum(
                    F.length("o_orderstatus") + F.length("o_orderpriority")
                )
                .cast("long")
                .alias("sum_strlen"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


Q105_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n,
    SUM(o_orderkey) AS sum_key,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
    SUM(date_diff('day', DATE '1990-01-01', o_orderdate)) AS sum_datediff,
    SUM(length(o_orderstatus) + length(o_orderpriority)) AS sum_strlen
  FROM orders
)
SELECT f.fmt,
  CAST(n AS BIGINT) AS n,
  CAST(sum_key AS BIGINT) AS sum_key,
  sum_price,
  CAST(sum_datediff AS BIGINT) AS sum_datediff,
  CAST(sum_strlen AS BIGINT) AS sum_strlen
FROM agg CROSS JOIN (VALUES ('csv'), ('json'), ('orc')) f(fmt)
"""

QUERIES.append(
    Query(
        "q105_format_roundtrip",
        q105_format_roundtrip,
        Q105_SQL,
        "CSV/JSON/ORC sink->source round trip: per-format aggregates hash-match the parquet original",
    )
)
