"""Scale-engineering utilities: skew salting and bucketed co-location.

These are the manual levers for the cases AQE can't fix alone:

- ``salted_agg``: two-phase aggregation for skewed group keys. Phase 1
  aggregates on (key, salt) — the hot key's rows spread over
  ``n_salts`` reducers; phase 2 merges the per-salt partials. Works
  for any algebraic aggregate (sum/count/min/max); the default
  partial+final HashAggregate already handles most skew via map-side
  combine, so reach for this only when a single post-combine key still
  overwhelms one reducer (e.g. count-distinct-like states).
- ``salted_join``: replicate the small side ``n_salts`` times and salt
  the big side's key — every hot key's rows land on ``n_salts``
  reducers instead of one. AQE's skew-join split handles sort-merge
  skew automatically; this is for the cases AQE can't split (e.g.
  aggregations stacked on the join key downstream).
- ``write_bucketed`` / ``read_bucketed``: hash-bucketed tables make
  equi-joins and aggregations on the bucket key shuffle-free — the
  100 TB answer to "this join runs every hour on the same key".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``agg_exprs`` maps output column -> one of sum/count/min/max over
    an input column, e.g. ``{"total": "sum(x)", "n": "count(*)"}``.
    Phase-2 merge uses sum for sum/count, min/max for min/max.
    """
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % n_salts).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[F.expr(expr).alias(out) for out, expr in agg_exprs.items()]
    )
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    merged = []
    for out, expr in agg_exprs.items():
        fn = expr.split("(", 1)[0].strip().lower()
        if fn not in mergers:
            raise ValueError(
                f"salted_agg supports {sorted(mergers)} aggregates, got "
                f"{expr!r}; decompose others (e.g. avg = sum/count) first"
            )
        merged.append(mergers[fn](out).alias(out))
    return phase1.groupBy(*key_cols).agg(*merged)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Output columns = big's columns + small's non-key columns.
    """
    big_salted = big.withColumn(
        "_salt",
        # pmod, not abs+%: abs(Long.MIN_VALUE) stays negative in
        # non-ANSI Spark, and a negative salt would silently drop the
        # row from an inner join against the replicated small side
        F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("_salt")
    small_rep = small.select("*", salts)
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a hash-bucketed (optionally sorted) managed table.

    Joins/aggregations between tables bucketed the same way on the
    same key plan WITHOUT a shuffle (no Exchange under the join) —
    pre-paying the shuffle once at write time.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
