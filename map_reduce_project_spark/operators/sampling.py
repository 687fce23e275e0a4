"""Deterministic sampling and dataset splitting for training pipelines.

`rand()`-based sampling is the wrong tool at cluster scale: it is
task-retry-unstable (a re-executed partition draws different rows, so
two actions over the same "sample" can disagree), partitioning-
dependent, and not reproducible across engines. Every operator here
derives its randomness from a salted md5 of the ROW CONTENT instead:

- the same row always lands in the same split/sample, regardless of
  partitioning, retries, cluster size, or engine (the DuckDB oracle
  runs the same expressions);
- adding data never reshuffles existing assignments (critical for
  train/test splits that must stay frozen as a corpus grows);
- the salt gives independent draws for independent uses.

The hash bucket is the first 8 md5 hex digits as an integer — uniform
on [0, 2^32) — taken modulo 10000 for basis-point precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10000  # basis-point granularity


def hash_bucket(id_col: str, salt: str) -> Column:
    """Deterministic uniform bucket in [0, 10000) from a salted md5 of
    the id column (portable: DuckDB spells it
    ('0x' || substr(md5(...), 1, 8))::BIGINT % 10000)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col))), 1, 8),
            16,
            10,
        ).cast("long")
        % _BUCKETS
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights
    (must sum to 1.0); adds a ``split`` string column.

    E.g. ``hash_split(docs, "doc_id", {"train": .8, "valid": .1,
    "test": .1})``. Assignment is a pure function of (salt, id):
    stable under repartitioning, retries, and corpus growth.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Content-hash Bernoulli sample: keeps each row iff its salted
    bucket falls below fraction. Same properties as hash_split."""
    return df.where(hash_bucket(id_col, salt) < int(round(fraction * _BUCKETS)))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_bp: Column,
    salt: str = "weighted",
) -> DataFrame:
    """Per-row weighted Bernoulli sample: keep each row with
    probability ``weight_bp``/10000 (integer basis points, clamped to
    [0, 10000]). The keep decision is an exact integer comparison of
    the salted content-hash bucket against the row's own weight —
    reproducible across engines, partitionings, and retries, unlike
    ``rand() < p``. This is the quality-weighted corpus downsampling
    primitive: derive ``weight_bp`` from a quality score and feed the
    kept set straight into training."""
    w = F.greatest(F.lit(0), F.least(F.lit(_BUCKETS), weight_bp.cast("long")))
    return df.where(hash_bucket(id_col, salt) < w)


def importance_upsample(
    df: DataFrame,
    id_col: str,
    weight_bp: Column,
    salt: str = "epoch",
) -> DataFrame:
    """Importance upsampling (epoch replication): emit each row
    floor(w) times plus one more with probability frac(w), where the
    weight is ``weight_bp``/10000 in integer basis points (w=25000 ->
    2 copies always, a 3rd with p=0.5). The fractional draw is the
    same exact content-hash comparison as ``weighted_sample``; copies
    are materialized with ``explode(sequence(...))`` — pure JVM
    expressions, no shuffle, output size = sum of weights. Adds a
    ``copy_idx`` column (0-based) so downstream shuffles spread the
    replicas. This is the high-quality-data epoch-multiplier used when
    mixing corpora for training (e.g. wiki x3, web x0.7)."""
    w = F.greatest(F.lit(0), weight_bp.cast("long"))
    whole = (w / _BUCKETS).cast("long")
    extra = F.when(hash_bucket(id_col, salt) < w % _BUCKETS, 1).otherwise(0)
    n = (whole + extra).alias("_n_copies")
    return (
        df.withColumn("_n_copies", n)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_n_copies") - 1)
            ),
        )
        .drop("_n_copies")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Domain balancing: keep at most ``cap`` rows per group, ranked
    by ``order_col`` DESC with ``id_col`` as the deterministic
    tiebreaker. The curation step that stops a handful of giant
    domains (or sources, or languages) from dominating the training
    mix — e.g. cap every registered domain at K documents, ranked by
    quality score.

    One shuffle on the group key + a row_number window. At 100 TB the
    skew risk is the window partition of a mega-domain; for that
    regime pre-filter with an approximate per-group count and only
    window the groups actually above the cap (everything else passes
    untouched) — the same two-tier shape as the hot-shingle prune.
    Output: the surviving rows plus their ``rank_in_group``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .where(F.col("rank_in_group") <= cap)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sample (the reproducible twin of
    ``DataFrame.sampleBy``): each stratum keeps its own fraction;
    strata absent from ``fractions`` are dropped."""
    bucket = hash_bucket(id_col, salt)
    cond = None
    for value, frac in fractions.items():
        this = (F.col(strata_col) == value) & (
            bucket < int(round(frac * _BUCKETS))
        )
        cond = this if cond is None else cond | this
    return df.where(cond if cond is not None else F.lit(False))


def hash_order(id_col: str, salt: str) -> Column:
    """Full 32-bit deterministic order key (same salted-md5 family as
    ``hash_bucket`` but un-bucketed): uniform on [0, 2^32), so ties
    are vanishingly rare and per-group rank-order is a frozen uniform
    shuffle of the group."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total_target: int,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based group rebalancing at alpha = 0.5 (the
    multilingual-pretraining mix rule: sample group g proportionally
    to count_g^alpha, flattening head groups and boosting tail ones).

    Integer-exact end to end so it runs under the hash gate:
    weight_g = isqrt(count_g) (FLOOR(SQRT(double)) is exact for
    counts < ~4.5e15 — sqrt is correctly rounded and the nearest
    integer boundary is > 1 ulp away below that), target_g =
    (total_target * weight_g) // sum(weights), and each group keeps
    its target_g documents of smallest ``hash_order`` — a frozen
    uniform draw, reproducible across engines/partitions/retries.

    Scale shape: one count aggregate, the target table broadcast
    back, one per-group rank window over the hash order. The window
    partition = one group; for a head group with billions of rows,
    swap the exact rank for the probabilistic threshold variant
    (``weighted_sample`` with weight_bp = 10000 * target_g/count_g)
    and accept +-sqrt(n) count noise — the usual exactness/skew
    trade, same consideration as the CCF window-vs-join paths.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("grp_count"))
    weights = counts.withColumn(
        "w",
        F.expr("CAST(FLOOR(SQRT(CAST(grp_count AS DOUBLE))) AS BIGINT)"),
    )
    total_w = weights.agg(F.sum("w").alias("sum_w"))
    targets = weights.crossJoin(F.broadcast(total_w)).select(
        group_col,
        "grp_count",
        F.expr(f"({total_target} * w) div sum_w").alias("grp_target"),
    )
    rk = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            hash_order(id_col, salt), F.col(id_col)
        )
    )
    return (
        df.withColumn("rk", rk.cast("long"))
        .join(F.broadcast(targets), group_col)
        .where(F.col("rk") <= F.col("grp_target"))
        .select(id_col, group_col, "grp_count", "grp_target", "rk")
    )


def balance_classes(
    df: DataFrame,
    label_col: str,
    id_col: str,
    salt: str = "balance",
) -> DataFrame:
    """Downsample every class to the MINORITY class size — the
    standard rebalancing step before fitting a classifier on skewed
    labels. Selection is a deterministic per-class hash ranking
    (md5(salt|id)), so the kept set is reproducible, engine-portable,
    and stable under retries/partitioning, like every sampler here.

    Plan: one count aggregate (broadcast scalar), one rank window per
    class (partitioned on the label — parallel across classes), one
    filter. The window sorts only within each class.
    """
    from pyspark.sql.window import Window

    min_count = (
        df.groupBy(label_col)
        .agg(F.count("*").alias("n"))
        .agg(F.min("n"))
        .collect()[0][0]
    )
    if min_count is None:
        # empty input: min(n) over zero groups is NULL, and a
        # `rank <= NULL` filter would silently return garbage instead
        # of the obvious answer
        return df.limit(0)
    draw = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col))), 1, 8),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(label_col).orderBy(draw, F.col(id_col))
    return (
        df.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= min_count)
        .drop("_r")
    )


def bootstrap_replicates(
    df: DataFrame,
    id_col: str,
    salt: str = "bootstrap",
    n_draws: int = 8,
) -> DataFrame:
    """Deterministic Poisson-style bootstrap: each row receives a
    replicate count ~ Binomial(n_draws, 1/n_draws) (mean 1 — the
    standard online-bootstrap approximation of multinomial resampling,
    Oza & Russell 2001), drawn from the row's salted content hash so
    the resample is reproducible, partitioning-invariant, and
    engine-portable (the same md5 discipline as every sampler here;
    never rand(), which re-rolls per task retry).

    Each of the first ``n_draws`` hex chars of md5(salt|id) is one
    Bernoulli(1/n_draws) trial for n_draws = 8 or 16 (char < '2' has
    probability 2/16 = 1/8; char < '1' is 1/16). Rows with count 0
    drop out; rows with count k are replicated k times with a
    ``replicate`` index — one narrow projection + one generator
    expression, no shuffle at all.

    Rows with a NULL ``id_col`` are deterministically EXCLUDED from
    every resample: md5 of NULL is NULL, so every Bernoulli trial
    falls to its otherwise(0) branch and the count is 0. Content
    hashing cannot give an anonymous row a stable identity; callers
    who need NULL-id rows resampled must assign surrogate ids first.
    """
    if n_draws == 8:
        hit = ("0", "1")
    elif n_draws == 16:
        hit = ("0",)
    else:
        raise ValueError("n_draws must be 8 or 16 (hex-char trials)")
    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    cnt = sum(
        F.when(F.substring(h, i + 1, 1).isin(*hit), 1).otherwise(0)
        for i in range(n_draws)
    )
    return (
        df.withColumn("_cnt", cnt)
        .where(F.col("_cnt") > 0)
        .withColumn(
            "replicate", F.explode(F.sequence(F.lit(1), F.col("_cnt")))
        )
        .withColumn("replicate", F.col("replicate").cast("long"))
        .drop("_cnt")
    )


def cap_per_group_skew(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Two-tier variant of ``cap_per_group`` for skewed group sizes —
    the 100 TB formulation its docstring promises: first ONE cheap
    count aggregate finds the groups actually above the cap, then the
    rank window runs ONLY over those groups' rows (a left-semi join
    against the tiny over-cap key set); every other row passes
    through untouched. On a web-scale corpus where a handful of mega
    domains hold most rows but 99% of GROUPS are under the cap, this
    windows only the hot tail instead of sorting the whole table.

    Output: the kept rows (same set as ``cap_per_group`` — pinned by
    test), without the rank column (computing ranks for under-cap
    groups would force the full window back in).
    """
    from pyspark.sql.window import Window

    # pin the over-cap key set: it feeds BOTH the anti and the semi
    # join below, and without the checkpoint each join re-runs the
    # full-table count aggregate — the one expensive scan this
    # operator exists to minimize would run twice
    hot_keys = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cap)
        .select(F.col(group_col).alias("_hot_key"))
        .localCheckpoint(eager=True)
    )
    # null-SAFE join condition: groupBy (and cap_per_group's window)
    # treat NULL as a group, so an over-cap NULL group must route to
    # the capped tier too — a plain equi-join would never match it
    # and let it through uncapped
    cond = F.col(group_col).eqNullSafe(F.col("_hot_key"))
    cold = df.join(F.broadcast(hot_keys), cond, "left_anti")
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    hot_kept = (
        df.join(F.broadcast(hot_keys), cond, "left_semi")
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= cap)
        .drop("_r")
    )
    return cold.unionByName(hot_kept)


# cumulative Poisson(lambda=1) CDF in integer MILLIONTHS — the draw is
# an exact integer comparison chain, so the resampling weights are
# bit-reproducible across engines, partitionings, and retries (the
# property rand()-based Poisson bootstrap loses on every retry). Tail
# mass beyond k=5 (~0.06%) maps to k=6: bias ~1e-4 on the mean,
# irrelevant to variance estimation, and a BOUNDED per-row fan-out cap
# matters more at corpus scale than the infinite tail.
_POISSON1_CDF_PPM = (367879, 735758, 919698, 981011, 996340, 999405)


def poisson_bootstrap_weights(
    df: DataFrame, id_col: str, salt: str = "poisson"
) -> DataFrame:
    """Poisson(1) bootstrap resampling weights — the distributed
    bootstrap: instead of resampling n rows WITH replacement (a global
    shuffle per replicate), each row draws an independent Poisson(1)
    multiplicity, which converges to the same bootstrap distribution
    (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams", Google 2012) and is embarrassingly parallel. The draw
    inverts the integer-millionth CDF table over the salted md5
    uniform (pure codegen arithmetic, no rand(), no UDF). Output: the
    input plus ``boot_weight`` in 0..6."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    k: Column = F.lit(len(_POISSON1_CDF_PPM))
    for i in range(len(_POISSON1_CDF_PPM) - 1, -1, -1):
        k = F.when(u < _POISSON1_CDF_PPM[i], i).otherwise(k)
    return df.withColumn("boot_weight", k.cast("long"))
