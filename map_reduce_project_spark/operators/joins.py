"""Temporal join operators Spark lacks as built-ins: as-of join and
keyless point-in-interval (range) join, expressed as compositions of
DataFrame primitives — no cross joins, no Python, no custom Catalyst.

The reference has no joins at all (SURVEY.md §2.3 — its only
join-like step is folded into a reducer); these two are the standard
temporal operators a training-data/eventlog pipeline needs, named in
the engine north star as first-class custom operators.

- ``asof_join``: per key, match each left row to the latest right row
  with right_ts <= left_ts (backward; or earliest >= for forward).
  Physical shape: ONE shuffle — tag both sides, union, and run a
  single ``last_value(ignoreNulls) over (partition by key order by
  ts, side rows unbounded preceding)`` window: at equal (key, ts) the
  right row sorts first, so exact-timestamp matches are visible, and
  every left row reads the running latest right payload. This is the
  sort-merge formulation databases use, minus any join operator —
  cost is one sort of |L|+|R|, never |L|x|R|.
- ``interval_point_join``: points joined into intervals with NO equi
  key. The naive plan is a cross join with a range filter (quadratic
  at scale); the scalable plan buckets the domain: each interval
  explodes into the fixed-width buckets it covers (bounded fan-out =
  interval_width/bucket + 1), each point hashes to exactly one
  bucket, and the pair becomes an equi-join on the bucket id with an
  exact range post-filter. A point matches an interval in exactly one
  bucket (the point's own), so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    right_prefix: str = "right_",
) -> DataFrame:
    """As-of (left) join: all left columns, plus each right column as
    ``{right_prefix}{name}`` from the matched right row (nulls when no
    right row qualifies).

    backward: latest right with right_ts <= left_ts.
    forward:  earliest right with right_ts >= left_ts.
    Ties on right_ts within a key are resolved by whichever sorts
    last (backward) / first (forward) in the window order —
    pre-deduplicate the right side per (key, ts) for fully
    deterministic output.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r_payload = F.struct(*[F.col(c) for c in right.columns]).alias("_r")
    l_type = left.select(l_payload).schema[0].dataType
    r_type = right.select(r_payload).schema[0].dataType

    tagged_l = left.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_payload,
        F.lit(None).cast(r_type).alias("_r"),
    )
    tagged_r = right.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_payload,
    )
    both = tagged_l.unionByName(tagged_r)

    keys = [f"_k{i}" for i in range(len(key_cols))]
    if direction == "backward":
        # right rows (side 0) sort before left at equal ts -> `<=`
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        # reverse scan (ts desc): the running last right payload is
        # the EARLIEST right_ts >= left_ts; side asc keeps right rows
        # visible at equal ts, matching `>=`
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)

    out = both.withColumn("_match", matched).where(F.col("_side") == 1)
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return out.select(*cols)


def _floor_bucket(sql_expr: str, width: int) -> Column:
    """Exact floor(x / width) bucket id for int64 x.

    SQL ``div`` is exact integer division (truncating toward zero);
    the CASE adjusts negative non-multiples down to floor semantics
    (Spark's ``%`` follows the dividend's sign, so ``x % w < 0`` is
    precisely "negative and not a multiple"). The previous
    ``F.floor(col / width)`` went through double division, which for
    |x| > ~2^53 — or quotients within an ulp of an integer — can
    round point-side and interval-side ids differently and silently
    drop matching pairs; same exactness rule as pack_sequences'
    integer ``div``. ``sql_expr`` is a SQL fragment (a column name or
    an arithmetic expression over columns in scope).
    """
    if width <= 0:
        raise ValueError(f"bucket_width must be positive, got {width}")
    e = f"CAST(({sql_expr}) AS BIGINT)"
    return F.expr(
        f"(({e}) div {width}) + "
        f"(CASE WHEN ({e}) % {width} < 0 THEN -1 ELSE 0 END)"
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    point_prefix: str = "",
    interval_prefix: str = "iv_",
) -> DataFrame:
    """Keyless range join: rows (point ⨝ interval) with
    lo <= point < hi, via fixed-width bucketing (see module doc).

    ``point_col``/``lo_col``/``hi_col`` must be integral (cast
    timestamps to epoch micros first); ``bucket_width`` in the same
    unit. Choose bucket_width >= the typical interval width so the
    per-interval fan-out stays ~2 buckets; at cluster scale the
    bucket id is the shuffle key, so narrower buckets = more
    parallelism (and more interval replicas) — a tunable, not a
    correctness knob.
    """
    p = points.select(
        *[F.col(c).alias(f"{point_prefix}{c}") for c in points.columns],
        _floor_bucket(f"`{point_col}`", bucket_width).alias("_bucket"),
        F.col(point_col).alias("_x"),
    )
    iv = intervals.where(F.col(hi_col) > F.col(lo_col)).select(
        *[F.col(c).alias(f"{interval_prefix}{c}") for c in intervals.columns],
        F.explode(
            F.sequence(
                _floor_bucket(f"`{lo_col}`", bucket_width),
                _floor_bucket(f"`{hi_col}` - 1", bucket_width),
            )
        ).alias("_bucket"),
        F.col(lo_col).alias("_lo"),
        F.col(hi_col).alias("_hi"),
    )
    return (
        p.join(iv, "_bucket")
        .where((F.col("_x") >= F.col("_lo")) & (F.col("_x") < F.col("_hi")))
        .drop("_bucket", "_x", "_lo", "_hi")
    )


# Exact sequence step width in seconds for the fixed-width units a
# date_trunc'ed UTC grid can use (months/years vary and must fall
# back to size(sequence(...))).
_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def sized_span_grid(
    spans: DataFrame,
    key_col: str,
    unit: str,
    lo_col: str = "_lo",
    hi_col: str = "_hi",
    out_col: str = "bucket_start",
    rows_per_partition: int = 1_000_000,
) -> DataFrame:
    """Explode each key's [lo, hi] span into its time grid WITH the
    generate stage spread across the cluster (optimization round 12,
    guide §2.5 input-skew note): ``spans`` is one tiny row per key, so
    AQE coalesces the aggregate that produced it down to a handful of
    partitions by BYTES — and the explode then fans the full grid
    (~span_hours x keys rows, 25-1000x the input) out on those few
    cores. Measured at sf0.1: the ev_interpolate grid (1.05M rows) ran
    its generate + join + two window passes on ONE partition, 13-21 s;
    spread, the same plan is ~2 s.

    The spread is VOLUME-SIZED, not a constant: spans is checkpointed
    (it is one row per key — tiny relative to anything upstream), the
    exact grid row count is computed with one scalar aggregate over
    it, and the repartition gets ceil(rows / rows_per_partition)
    partitions, floored at the cluster's default parallelism — the
    same measured-volume recipe as graph/analytics' wedge sizing.
    Hash-partitioning by the key also pre-establishes the distribution
    every downstream per-key window/join needs, so the explicit
    exchange replaces (not adds to) the one Catalyst would insert.

    NB (r12 advisory): the fixed-unit fast-path row estimate
    (unix_timestamp delta / step + 1) assumes lo/hi truncated to the
    unit and wall-clock-fixed steps; under a non-UTC session timezone
    DST makes INTERVAL 1 DAY/WEEK steps 23/25 h, so the estimate can
    drift from the true grid size. The count is used ONLY for
    partition sizing — row values come from sequence() itself and are
    never affected; a drifted estimate just means slightly off
    partition counts (the session here pins UTC).
    """
    spark = spans.sparkSession
    spans = spans.localCheckpoint(eager=True)
    step = _UNIT_SECONDS.get(unit)
    if step is not None:
        per_key = (
            F.unix_timestamp(hi_col) - F.unix_timestamp(lo_col)
        ) / step + 1
    else:
        per_key = F.size(
            F.sequence(lo_col, hi_col, F.expr(f"INTERVAL 1 {unit}"))
        )
    n_rows = (
        spans.agg(F.sum(per_key.cast("long")).alias("n")).collect()[0]["n"]
        or 0
    )
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        min(65536, int(n_rows // rows_per_partition) + 1),
    )
    return spans.repartition(n_parts, key_col).select(
        key_col,
        F.explode(
            F.sequence(lo_col, hi_col, F.expr(f"INTERVAL 1 {unit}"))
        ).alias(out_col),
    )


def fill_time_gaps(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "hour",
):
    """Time-series densification: one row per (key, bucket) for EVERY
    bucket between each key's first and last event, zero-filled where
    the key was silent — the resample step before any
    window/lag/trend computation that assumes contiguous buckets
    (silence is signal; a plain groupBy silently drops it).

    Shape: one bucket aggregate, one per-key span aggregate, the grid
    generated with ``sequence`` + ``explode`` (no driver loop, no
    cross join — each key materializes only ITS span) and spread by
    ``sized_span_grid`` so the fan-out runs at cluster parallelism,
    and one co-partitioned left join. All exchanges hash on the key.
    Output: (key, bucket_start, n_events).
    """
    from pyspark.sql import functions as F

    bucket = F.date_trunc(unit, F.col(ts_col))
    counts = (
        df.groupBy(F.col(key_col), bucket.alias("bucket_start"))
        .agg(F.count("*").alias("_n"))
    )
    spans = df.groupBy(key_col).agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    grid = sized_span_grid(spans, key_col, unit)
    return grid.join(counts, [key_col, "bucket_start"], "left").select(
        key_col,
        "bucket_start",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    left_prefix: str = "",
    right_prefix: str = "ov_",
) -> DataFrame:
    """Keyless interval-OVERLAP join: all (left, right) pairs whose
    half-open intervals intersect (l_lo < r_hi AND r_lo < l_hi), via
    the same fixed-width bucketing as ``interval_point_join`` — but
    with BOTH sides replicated across their covered buckets, a
    qualifying pair would meet in every shared bucket. The dedup is
    plan-free: a pair is emitted ONLY in the bucket containing its
    overlap START max(l_lo, r_lo) (provably covered by both sides'
    bucket ranges when the overlap is non-empty), so no distinct pass
    and no duplicate rows ever exist.

    Bounds must be integral (epoch micros); at cluster scale the
    bucket id is the shuffle key and replication factor is
    interval_width / bucket_width + 1 per side — same tuning rule as
    the point join.
    """
    lv = left.where(F.col(l_hi) > F.col(l_lo)).select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
        F.explode(
            F.sequence(
                _floor_bucket(f"`{l_lo}`", bucket_width),
                _floor_bucket(f"`{l_hi}` - 1", bucket_width),
            )
        ).alias("_bucket"),
        F.col(l_lo).alias("_llo"),
        F.col(l_hi).alias("_lhi"),
    )
    rv = right.where(F.col(r_hi) > F.col(r_lo)).select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        F.explode(
            F.sequence(
                _floor_bucket(f"`{r_lo}`", bucket_width),
                _floor_bucket(f"`{r_hi}` - 1", bucket_width),
            )
        ).alias("_bucket"),
        F.col(r_lo).alias("_rlo"),
        F.col(r_hi).alias("_rhi"),
    )
    return (
        lv.join(rv, "_bucket")
        .where(
            (F.col("_llo") < F.col("_rhi"))
            & (F.col("_rlo") < F.col("_lhi"))
            & (
                F.col("_bucket")
                == _floor_bucket("greatest(_llo, _rlo)", bucket_width)
            )
        )
        .drop("_bucket", "_llo", "_lhi", "_rlo", "_rhi")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
) -> DataFrame:
    """NEAREST-event as-of join: for each left row, the right row
    minimizing |right_ts - left_ts| within the key, with the BACKWARD
    candidate winning exact-distance ties (and an equal-timestamp
    right row counting as backward). Nulls when the key has no right
    rows at all.

    One union + ONE sort per key (two window passes over the same
    ordering — Catalyst plans a single exchange+sort): the running
    last-right-payload before each left row is the backward
    candidate, the reverse-scan twin is the forward candidate, and a
    per-row comparison of the two microsecond distances picks the
    winner. Never an all-pairs join — the oracle does the quadratic
    candidate ranking instead, which is exactly why the engine
    doesn't. Ties BETWEEN two same-distance right rows on the same
    side are resolved by the window order; pre-deduplicate the right
    side per (key, ts) for fully deterministic output (same contract
    as ``asof_join``)."""
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r_payload = F.struct(*[F.col(c) for c in right.columns]).alias("_r")
    l_type = left.select(l_payload).schema[0].dataType
    r_type = right.select(r_payload).schema[0].dataType

    tagged_l = left.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_payload,
        F.lit(None).cast(r_type).alias("_r"),
    )
    tagged_r = right.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_payload,
    )
    both = tagged_l.unionByName(tagged_r)
    keys = [f"_k{i}" for i in range(len(key_cols))]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last("_r", ignorenulls=True).over(w_back)
    fwd = F.first("_r", ignorenulls=True).over(w_fwd)
    lts = F.unix_micros(F.col("_ts"))
    bdist = lts - F.unix_micros(back.getField(right_ts))
    fdist = F.unix_micros(fwd.getField(right_ts)) - lts
    chosen = (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(bdist <= fdist, back)
        .otherwise(fwd)
    )
    out = (
        both.withColumn("_match", chosen)
        .where(F.col("_side") == 1)
    )
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
    ]
    return out.select(*cols)
