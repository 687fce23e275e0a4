"""Temporal-join queries over the events table: as-of join and
keyless point-in-interval range join (operators/joins.py), each with
an exact DuckDB oracle (DuckDB has native ASOF JOIN; the range join
oracles as a plain inequality join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.operators.joins import (
    asof_join,
    interval_point_join,
)
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

BLAST_US = 300_000_000  # 5 minutes in microseconds


def _typed(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == event_type)


def asof_click_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's LATEST preceding click
    (as-of backward) — the single-winner variant of last-touch
    attribution. The right side is pre-deduplicated per (user_id, ts)
    so ties cannot make the match nondeterministic."""
    purchases = _typed(spark, sf_dir, "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = (
        _typed(spark, sf_dir, "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        direction="backward",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("right_click_id").alias("click_id"),
        F.col("right_ts").alias("click_ts"),
    )


ASOF_CLICK_SQL = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.purchase_id, p.user_id, p.purchase_ts,
       c.click_id, c.ts AS click_ts
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.purchase_ts >= c.ts
"""


def range_error_blast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases inside the 5-minute blast window after ANY error
    event — a keyless point-in-interval join (bucketed equi-join on
    fixed-width time buckets, operators/joins.py), NOT a cross join."""
    purchases = _typed(spark, sf_dir, "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.unix_micros("ts").alias("pt_us"),
    )
    errors = _typed(spark, sf_dir, "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        F.unix_micros("ts").alias("lo_us"),
        (F.unix_micros("ts") + F.lit(BLAST_US)).alias("hi_us"),
    )
    out = interval_point_join(
        purchases,
        errors,
        point_col="pt_us",
        lo_col="lo_us",
        hi_col="hi_us",
        bucket_width=BLAST_US,
    )
    return out.select(
        "purchase_id",
        "purchase_ts",
        F.col("iv_error_id").alias("error_id"),
        F.col("iv_error_ts").alias("error_ts"),
    )


RANGE_BLAST_SQL = """
SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
       e.event_id AS error_id, e.ts AS error_ts
FROM events p
JOIN events e
  ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 5 MINUTE
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
"""


QUERIES = [
    Query("asof_click_attribution", asof_click_attribution_q, ASOF_CLICK_SQL, "as-of backward join: purchase -> latest preceding click per user (DuckDB ASOF oracle)"),
    Query("range_error_blast", range_error_blast_q, RANGE_BLAST_SQL, "keyless point-in-interval join via time bucketing (inequality-join oracle)"),
]

def linear_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the hour before
    a purchase shares the credit equally. Credit is emitted as a
    RATIONAL (credit_num=1, credit_den=n_touches) so the whole query
    is integer-exact under the hash gate — the float credit is one
    downstream division away, but the exact rational is also the
    right thing to store (no drift when credits are re-aggregated).
    Built on the same bounded interval join as the as-of/streaming
    attribution (state bound = the window, never the stream)."""
    from pyspark.sql.window import Window

    from map_reduce_project_spark.streaming.sinks import (
        purchase_attribution,
    )

    ev = read_table(spark, sf_dir, "events")
    touched = purchase_attribution(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        "1 hour",
    )
    n = F.count("*").over(Window.partitionBy("purchase_id"))
    return touched.select(
        "purchase_id",
        "click_id",
        F.lit(1).cast("long").alias("credit_num"),
        n.cast("long").alias("credit_den"),
    )


LINEAR_ATTR_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), touched AS (
  SELECT p.purchase_id, c.click_id
  FROM p JOIN c ON p.user_id = c.user_id
    AND c.click_ts <= p.purchase_ts
    AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
)
SELECT purchase_id, click_id,
  CAST(1 AS BIGINT) AS credit_num,
  CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS credit_den
FROM touched
"""

QUERIES.append(
    Query(
        "linear_attribution",
        linear_attribution_q,
        LINEAR_ATTR_SQL,
        "linear multi-touch attribution with exact rational credits",
    )
)



ASOF_COGROUP_SCHEMA = (
    "purchase_id long, user_id long, purchase_ts timestamp, "
    "click_id long, click_ts timestamp"
)


def ev_asof_cogroup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUPED applyInPandas surface: the same purchase->latest-
    preceding-click as-of join as ``asof_click_attribution``, but
    executed as ``groupBy(user).cogroup(groupBy(user)).applyInPandas``
    with ``pandas.merge_asof`` inside each group — the escape hatch
    for per-key logic that genuinely needs two aligned inputs in
    Python. Hash-checked against the SAME DuckDB ASOF oracle as the
    native operator, so the pandas twin is pinned equal to the
    declarative plan (functions/udafs.py policy).

    Scale: both sides shuffle once on the key; each group ships to
    Python Arrow-batched. Groups must fit in worker memory — for
    million-row users prefer the native ``operators.joins.asof_join``
    (union + window), which spills.
    """
    import pandas as pd

    purchases = _typed(spark, sf_dir, "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = (
        _typed(spark, sf_dir, "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_id")
    )

    cols = ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "purchase_ts": pd.Series(dtype="datetime64[us]"),
                    "click_id": pd.Series(dtype="Int64"),
                    "click_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        left = left.sort_values("purchase_ts")
        right = right.drop(columns=["user_id"]).sort_values("click_ts")
        if right.empty:
            out = left.copy()
            out["click_id"] = pd.array([None] * len(out), dtype="Int64")
            out["click_ts"] = pd.NaT
        else:
            out = pd.merge_asof(
                left,
                right,
                left_on="purchase_ts",
                right_on="click_ts",
                direction="backward",
            )
            out["click_id"] = out["click_id"].astype("Int64")
        return out[cols]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(merge, schema=ASOF_COGROUP_SCHEMA)
    )


QUERIES.append(
    Query(
        "ev_asof_cogroup",
        ev_asof_cogroup_q,
        ASOF_CLICK_SQL,
        "cogrouped applyInPandas merge_asof twin of the native as-of join (same ASOF oracle)",
    )
)


def asof_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each click matched to the user's EARLIEST
    following purchase — time-to-convert measurement, and the gate for
    the operator's direction="forward" path (backward is gated by
    asof_click_attribution). DuckDB's ASOF JOIN flips to forward by
    reversing the inequality."""
    clicks = _typed(spark, sf_dir, "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = (
        _typed(spark, sf_dir, "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        left_ts="click_ts",
        right_ts="ts",
        direction="forward",
    )
    return out.select(
        "click_id",
        "user_id",
        "click_ts",
        F.col("right_purchase_id").alias("purchase_id"),
        F.col("right_ts").alias("purchase_ts"),
    )


ASOF_FORWARD_SQL = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.click_id, c.user_id, c.click_ts,
       p.purchase_id, p.ts AS purchase_ts
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.click_ts <= p.ts
"""

QUERIES.append(
    Query(
        "asof_forward",
        asof_forward_q,
        ASOF_FORWARD_SQL,
        "forward as-of join: click -> earliest following purchase (time-to-convert)",
    )
)


def range_session_blast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join under the exact gate: every user session
    (30-min-gap session windows, inclusive span made half-open with a
    +1µs end) that overlaps any error's 5-minute blast interval — the
    incident-impact question ("which sessions were exposed?"), and the
    gate for operators.joins.interval_overlap_join's bucketed,
    dedup-free plan. Oracle is the plain inequality join.
    """
    from map_reduce_project_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = read_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("last_event"))
        .select(
            "user_id",
            "session_start",
            F.unix_micros("session_start").alias("s_lo"),
            (F.unix_micros("last_event") + 1).alias("s_hi"),
        )
    )
    errors = _typed(spark, sf_dir, "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        F.unix_micros("ts").alias("e_lo"),
        (F.unix_micros("ts") + F.lit(BLAST_US)).alias("e_hi"),
    )
    out = interval_overlap_join(
        sessions, errors, "s_lo", "s_hi", "e_lo", "e_hi",
        bucket_width=BLAST_US,
    )
    return out.select(
        "user_id",
        "session_start",
        F.col("ov_error_id").alias("error_id"),
        F.col("ov_error_ts").alias("error_ts"),
    )


RANGE_SESSION_BLAST_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
),
sessions AS (
  SELECT user_id, MIN(ts) AS session_start,
         CAST(epoch_us(MIN(ts)) AS BIGINT) AS s_lo,
         CAST(epoch_us(MAX(ts)) + 1 AS BIGINT) AS s_hi
  FROM s GROUP BY user_id, session_id
),
errors AS (
  SELECT event_id AS error_id, ts AS error_ts,
         CAST(epoch_us(ts) AS BIGINT) AS e_lo,
         CAST(epoch_us(ts) + 300000000 AS BIGINT) AS e_hi
  FROM events WHERE event_type = 'error'
)
SELECT sessions.user_id, sessions.session_start,
       errors.error_id, errors.error_ts
FROM sessions JOIN errors
  ON sessions.s_lo < errors.e_hi AND errors.e_lo < sessions.s_hi
"""

QUERIES.append(
    Query(
        "range_session_blast",
        range_session_blast_q,
        RANGE_SESSION_BLAST_SQL,
        "interval-overlap join: sessions exposed to error-blast windows (bucketed, dedup-free)",
    )
)


def ushape_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: first and
    last touches earn 40% each, middles split the remaining 20% — the
    standard marketing-mix alternative to linear credit. Credits are
    exact RATIONALS (2/5 for endpoints, 1/(5·n_mid) for middles;
    whole credit for n=1, halves for n=2), so the gate is hash-exact
    and re-aggregation never drifts. Same bounded interval join as
    linear_attribution; one rank window per purchase on top.
    """
    from pyspark.sql.window import Window

    from map_reduce_project_spark.streaming.sinks import (
        purchase_attribution,
    )

    ev = read_table(spark, sf_dir, "events")
    touched = purchase_attribution(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        "1 hour",
    )
    wp = Window.partitionBy("purchase_id")
    w = wp.orderBy("click_ts", "click_id")
    n = F.count("*").over(wp)
    pos = F.row_number().over(w)
    num = (
        F.when(n == 1, F.lit(1))
        .when(n == 2, F.lit(1))
        .when((pos == 1) | (pos == n), F.lit(2))
        .otherwise(F.lit(1))
    )
    den = (
        F.when(n == 1, F.lit(1))
        .when(n == 2, F.lit(2))
        .when((pos == 1) | (pos == n), F.lit(5))
        .otherwise(F.lit(5) * (n - 2))
    )
    return touched.select(
        "purchase_id",
        "click_id",
        pos.cast("long").alias("touch_pos"),
        num.cast("long").alias("credit_num"),
        den.cast("long").alias("credit_den"),
    )


USHAPE_ATTR_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), touched AS (
  SELECT p.purchase_id, c.click_id, c.click_ts
  FROM p JOIN c ON p.user_id = c.user_id
    AND c.click_ts <= p.purchase_ts
    AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
), ranked AS (
  SELECT purchase_id, click_id,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS touch_pos,
         CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n
  FROM touched
  WINDOW w AS (PARTITION BY purchase_id ORDER BY click_ts, click_id)
)
SELECT purchase_id, click_id, touch_pos,
  CAST(CASE WHEN n <= 2 THEN 1
            WHEN touch_pos = 1 OR touch_pos = n THEN 2
            ELSE 1 END AS BIGINT) AS credit_num,
  CAST(CASE WHEN n = 1 THEN 1
            WHEN n = 2 THEN 2
            WHEN touch_pos = 1 OR touch_pos = n THEN 5
            ELSE 5 * (n - 2) END AS BIGINT) AS credit_den
FROM ranked
"""

QUERIES.append(
    Query(
        "ushape_attribution",
        ushape_attribution_q,
        USHAPE_ATTR_SQL,
        "position-based (U-shaped) attribution with exact rational credits",
    )
)


def timedecay_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution: each touch's weight halves every 30
    minutes of distance from the purchase (half-life credit). The
    weight is an exact RATIONAL power of two — (1, 2^k) with
    k = floor(dt / 30min) — so the gate hashes exactly and the float
    weight is one downstream division; normalization (weight / sum)
    stays downstream like the other attribution variants, keeping
    stored credits re-aggregatable without drift.
    """
    from map_reduce_project_spark.streaming.sinks import (
        purchase_attribution,
    )

    ev = read_table(spark, sf_dir, "events")
    touched = purchase_attribution(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        "1 hour",
    )
    k = F.floor(
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).cast("double")
        / (30 * 60 * 1_000_000)
    ).cast("long")
    return touched.select(
        "purchase_id",
        "click_id",
        k.alias("halflives"),
    ).select(
        "purchase_id",
        "click_id",
        "halflives",
        F.lit(1).cast("long").alias("weight_num"),
        F.expr("cast(shiftleft(1, cast(halflives as int)) as bigint)").alias(
            "weight_den"
        ),
    )


TIMEDECAY_ATTR_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), touched AS (
  SELECT p.purchase_id, c.click_id,
         CAST(FLOOR(CAST(epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS DOUBLE)
              / 1800000000) AS BIGINT) AS halflives
  FROM p JOIN c ON p.user_id = c.user_id
    AND c.click_ts <= p.purchase_ts
    AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
)
SELECT purchase_id, click_id, halflives,
  CAST(1 AS BIGINT) AS weight_num,
  CAST(1 << halflives AS BIGINT) AS weight_den
FROM touched
"""

QUERIES.append(
    Query(
        "timedecay_attribution",
        timedecay_attribution_q,
        TIMEDECAY_ATTR_SQL,
        "time-decay attribution: exact power-of-two rational half-life weights",
    )
)


def asof_convert_time_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact p50/p90/max of the
    click-to-purchase delay (from the backward as-of match), per
    purchase hour-of-day — the latency-histogram view of the
    attribution data. Delays are integer seconds; the percentiles are
    DISC (element selection, not interpolation), so every output cell
    is an exact integer.
    """
    purchases = _typed(spark, sf_dir, "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = (
        _typed(spark, sf_dir, "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    matched = asof_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        direction="backward",
    ).where(F.col("right_click_id").isNotNull())
    delays = matched.select(
        F.hour("purchase_ts").cast("long").alias("hour_of_day"),
        (
            F.expr("unix_micros(purchase_ts) div 1000000")
            - F.expr("unix_micros(right_ts) div 1000000")
        ).alias("delay_s"),
    )
    return delays.groupBy("hour_of_day").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_s)")
        .cast("long")
        .alias("p50_s"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_s)")
        .cast("long")
        .alias("p90_s"),
        F.max("delay_s").cast("long").alias("max_s"),
    )


ASOF_CONVERT_TIME_SQL = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
matched AS (
  SELECT p.purchase_ts, c.ts AS click_ts
  FROM purchases p
  ASOF JOIN clicks c
    ON p.user_id = c.user_id AND p.purchase_ts >= c.ts
),
delays AS (
  SELECT CAST(EXTRACT(hour FROM purchase_ts) AS BIGINT) AS hour_of_day,
         CAST(epoch_us(purchase_ts) // 1000000
              - epoch_us(click_ts) // 1000000 AS BIGINT) AS delay_s
  FROM matched
)
SELECT hour_of_day, COUNT(*) AS n,
  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_s) AS BIGINT) AS p50_s,
  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_s) AS BIGINT) AS p90_s,
  CAST(MAX(delay_s) AS BIGINT) AS max_s
FROM delays
GROUP BY hour_of_day
"""

QUERIES.append(
    Query(
        "asof_convert_time",
        asof_convert_time_q,
        ASOF_CONVERT_TIME_SQL,
        "click-to-purchase delay percentiles (exact DISC) per purchase hour",
    )
)


def asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: each purchase matched to the user's click
    closest in time in EITHER direction, backward winning exact-
    distance ties — the sensor-fusion/attribution variant neither
    directional as-of expresses (operators.joins.asof_join_nearest:
    one union + one sort per key, backward and forward candidates
    from two window passes over the same ordering, never an
    all-pairs join). The oracle ranks the quadratic per-user
    candidate set instead — feasible only at oracle scale, which is
    the point."""
    from map_reduce_project_spark.operators.joins import (
        asof_join_nearest,
    )

    purchases = _typed(spark, sf_dir, "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = (
        _typed(spark, sf_dir, "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join_nearest(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("right_click_id").alias("click_id"),
        F.col("right_ts").alias("click_ts"),
    )


ASOF_NEAREST_SQL = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
cand AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts,
         c.click_id, c.ts AS click_ts,
    ROW_NUMBER() OVER (
      PARTITION BY p.purchase_id
      ORDER BY CASE WHEN c.ts <= p.purchase_ts
                    THEN p.purchase_ts - c.ts
                    ELSE c.ts - p.purchase_ts END,
               CASE WHEN c.ts <= p.purchase_ts THEN 0 ELSE 1 END
    ) AS rn
  FROM purchases p JOIN clicks c ON c.user_id = p.user_id
)
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM cand WHERE rn = 1
UNION ALL
SELECT p.purchase_id, p.user_id, p.purchase_ts,
       CAST(NULL AS BIGINT) AS click_id,
       CAST(NULL AS TIMESTAMP) AS click_ts
FROM purchases p
WHERE NOT EXISTS (SELECT 1 FROM clicks c WHERE c.user_id = p.user_id)
"""

QUERIES.append(
    Query(
        "asof_nearest",
        asof_nearest_q,
        ASOF_NEAREST_SQL,
        "nearest-event as-of join (either direction, backward wins ties) vs quadratic candidate-ranking oracle",
    )
)
