"""Deterministic streaming-sketch operators built from exact integer
hash arithmetic, so the SKETCH STRUCTURE ITSELF is hash-gateable
cross-engine (the q23/q46/q47 contract-tier pattern gates estimates
against error bounds; these gate the sketch bit-for-bit).

- Count-min (Cormode & Muthukrishnan 2005): a depth x width integer
  table; every key increments one counter per row (col = salted hash
  mod width); the point estimate is the MIN over rows and NEVER
  under-counts. The mergeable frequency sketch behind heavy-hitter
  serving at stream scale: the table is a fixed few KB no matter the
  corpus, and two tables merge by cell-wise addition (partial + final
  aggregation is exactly that merge, so Spark builds it in one
  distributed pass with no extra machinery).

- Bloom membership (Bloom 1970): k salted bit positions per key in an
  m-bit space; a probe key "hits" iff ALL k positions are set. No
  false negatives by construction; false-positive rate trades against
  m. The broadcastable decontamination filter: ship the bit set, not
  the corpus.

Both use the repo's md5 discipline (reproducible, engine-portable,
retry-stable — the DuckDB oracle runs the same expressions); never
xxhash/rand, which the oracle engine can't replay.

Reference scope note: the reference has no sketches (SURVEY.md §2.3);
these extend the approx-aggregation family (q23 HLL twin, q46
freqItems, q47 percentile_approx, q51 DataSketches HLL) named in the
north star's 100 TB brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_mod(key: Column, salt: str, mod: int) -> Column:
    """Salted md5 -> uniform int in [0, mod) — exact integer, same
    spelling as the samplers' hash_bucket (DuckDB twin:
    ('0x' || substr(md5(salt || '|' || key), 1, 8))::BIGINT % mod)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cm",
) -> DataFrame:
    """Build the count-min table in ONE distributed pass: explode each
    row into its ``depth`` (row, col) cells and count — Catalyst plans
    partial+final HashAggregate, which IS the sketch's cell-wise merge
    (every map partition builds a local table, the shuffle merges
    them). Output (d, col, cnt): at most depth*width rows regardless
    of input volume. Missing cells are zero by omission.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("d"),
                        _hash_mod(F.col(key_col), f"{salt}{d}", width).alias(
                            "col"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.groupBy(
            F.col("cell.d").alias("d"), F.col("cell.col").alias("col")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def count_min_estimate(
    cm: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cm",
) -> DataFrame:
    """Point-estimate probe keys against a count-min table: min over
    the key's ``depth`` cells. The table is broadcast (it is at most
    depth*width rows by construction); probes stay distributed —
    estimating a billion keys is a narrow map over the broadcast
    table. Output: probes + ``cm_est``. Guaranteed cm_est >= true
    count (the sketch never undercounts).
    """
    keyed = (
        probes.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("long").alias("d"),
                            _hash_mod(
                                F.col(key_col), f"{salt}{d}", width
                            ).alias("col"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("cell"),
        )
        .select(key_col, F.col("cell.d").alias("d"), F.col("cell.col").alias("col"))
    )
    # Verdicts are per DISTINCT key, then joined back, so duplicate
    # probe rows keep their cardinality and each carries the estimate.
    est = (
        keyed.join(F.broadcast(cm), ["d", "col"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cm_est"))
    ).withColumnRenamed(key_col, "_cm_key")
    # null-SAFE join back: a NULL probe key is a real group (its
    # hashes are NULL -> no cell matches -> estimate 0) and must not
    # fall out of an equi-join as a NULL verdict
    return probes.join(
        est, F.col(key_col).eqNullSafe(F.col("_cm_key")), "left"
    ).drop("_cm_key")


def bloom_bits(
    df: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """The set bit positions of a Bloom filter over ``df``'s keys:
    each key sets ``n_hashes`` salted positions in [0, n_bits). Output
    (bit long) distinct — at most n_bits rows, broadcastable by
    construction. One explode + one dedup-by-aggregation pass.
    """
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        _hash_mod(F.col(key_col), f"{salt}{i}", n_bits)
                        for i in range(n_hashes)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Membership-test probe keys against Bloom bit positions: a key
    hits iff ALL its positions are set. The bit set is broadcast; the
    probe side is a narrow map — the decontamination shape: train-set
    keys stream through a broadcast eval-set filter, no shuffle of the
    big side. Output: probes + ``bloom_hit`` boolean (no false
    negatives; false positives bounded by the (n_bits, n_hashes)
    choice).
    """
    keyed = (
        probes.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(
                F.array(
                    *[
                        _hash_mod(F.col(key_col), f"{salt}{i}", n_bits)
                        for i in range(n_hashes)
                    ]
                )
            ).alias("bit"),
        )
    )
    # A key hits iff EVERY position is set: min-over-bits == 1, which
    # is duplicate-safe (sum == n_hashes would break if the same probe
    # row appeared twice — the groups would merge and the sum would be
    # k*n_hashes, a silent FALSE NEGATIVE). Verdicts are per DISTINCT
    # key and joined back, preserving probe cardinality.
    hits = (
        keyed.join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
        )
        .groupBy(key_col)
        .agg(
            (F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1).alias(
                "bloom_hit"
            )
        )
    ).withColumnRenamed(key_col, "_bl_key")
    # null-safe join back (same reason as count_min_estimate): a NULL
    # key's verdict is a concrete False, never a NULL
    return probes.join(
        hits, F.col(key_col).eqNullSafe(F.col("_bl_key")), "left"
    ).drop("_bl_key")
