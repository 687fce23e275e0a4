"""Engine-seam fuzzing: randomized Spark-vs-DuckDB parity on the
exact seams the correctness gate crosses — RANGE window frames at
boundary values, NULL/NaN/Inf ordering, and case-insensitive
collation. The session-gap end-inclusive boundary (round 4) was found
by exactly this kind of fuzz; these suites keep the adversarial
pressure on the remaining seams.

Every comparison here canonicalizes both engines' results the same
way the driver gate does (column-sorted, row-sorted, stringified), so
a seam found here is a seam the gate would eventually hit on less
convenient data.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest


def _both(spark, con, pdf: pd.DataFrame, spark_sql: str, duck_sql: str):
    """Run spark_sql on a temp view and duck_sql on the same frame;
    return both as row-sorted lists of stringified tuples."""
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    con.register("t", pdf)
    s = spark.sql(spark_sql).toPandas()
    d = con.execute(duck_sql).df()

    def canon(x: pd.DataFrame):
        x = x[sorted(x.columns)]
        rows = [tuple(str(v) for v in r) for r in x.itertuples(index=False)]
        return sorted(rows)

    return canon(s), canon(d)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_range_window_int_boundaries(spark, duck):
    # RANGE frames over ints with heavy duplicate order values: peers
    # share a frame, and frame ends land EXACTLY on other rows'
    # values (values drawn from a tiny domain). A frame-boundary
    # off-by-one (inclusive vs exclusive PRECEDING/FOLLOWING edge)
    # shifts sums on almost every row.
    for seed in (3, 17, 91):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(3), rng.randrange(12), rng.randrange(-5, 6))
            for _ in range(120)
        ]
        pdf = pd.DataFrame(rows, columns=["k", "o", "v"])
        # CAST the sums: DuckDB SUM(BIGINT) yields HUGEINT which
        # lands in pandas as float64 — the dtype seam every real
        # oracle handles the same way
        sql = """
SELECT k, o, v,
  CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
               RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS s_back,
  CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
               RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING) AS BIGINT)
    AS s_fwd,
  CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
    AS s_sym,
  COUNT(*) OVER (PARTITION BY k ORDER BY o
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS n_peers_cume
FROM t
"""
        s, d = _both(spark, duck, pdf, sql, sql)
        assert s == d, f"seed={seed}"


def test_range_window_interval_boundaries(spark, duck):
    # time-based RANGE frames with timestamps that collide exactly at
    # the interval edge (multiples of the 10 s window width) — the
    # boundary the session-gap bug lived on
    for seed in (5, 23):
        rng = random.Random(seed)
        rows = [
            (
                rng.randrange(2),
                pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=10 * rng.randrange(12)),
                rng.randrange(1, 5),
            )
            for _ in range(80)
        ]
        pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
        spark_sql = """
SELECT k, ts, v,
  CAST(SUM(v) OVER (PARTITION BY k ORDER BY ts
               RANGE BETWEEN INTERVAL 10 SECONDS PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS s_10s
FROM t
"""
        duck_sql = """
SELECT k, ts, v,
  CAST(SUM(v) OVER (PARTITION BY k ORDER BY ts
               RANGE BETWEEN INTERVAL 10 SECONDS PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS s_10s
FROM t
"""
        s, d = _both(spark, duck, pdf, spark_sql, duck_sql)
        assert s == d, f"seed={seed}"


def test_null_nan_ordering_parity(spark, duck):
    # doubles with NULL, NaN, +/-Inf and -0.0: both engines sort NaN
    # above +Inf (IEEE total order) but default NULL placement
    # DIFFERS (Spark: NULLS FIRST asc; DuckDB: NULLS LAST) — every
    # oracle must spell it explicitly, and this fuzz pins that a
    # spelled-out ordering agrees on every boundary value
    specials = [None, math.nan, math.inf, -math.inf, 0.0, -0.0]
    for seed in (11, 47):
        rng = random.Random(seed)
        vals = [
            rng.choice(specials) if rng.random() < 0.4
            else round(rng.uniform(-2, 2), 3)
            for _ in range(60)
        ]
        pdf = pd.DataFrame(
            {"id": range(len(vals)), "v": pd.array(vals, dtype="float64")}
        )
        sql = """
SELECT id, v,
  RANK() OVER (ORDER BY v ASC NULLS FIRST) AS r_asc,
  RANK() OVER (ORDER BY v DESC NULLS LAST) AS r_desc,
  ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST, id) AS rn
FROM t
"""
        s, d = _both(spark, duck, pdf, sql, sql)
        assert s == d, f"seed={seed}"


def test_null_nan_aggregate_parity(spark, duck):
    # MIN/MAX over NaN/Inf mixtures: Spark's MAX returns NaN when any
    # NaN is present (NaN is the greatest double); DuckDB must agree
    # for max/min oracles over float columns to be trustworthy
    pdf = pd.DataFrame(
        {
            "k": [0, 0, 0, 1, 1, 2, 2, 3],
            "v": pd.array(
                [1.0, math.nan, math.inf, -math.inf, 2.0, None, 3.0, None],
                dtype="float64",
            ),
        }
    )
    # NB: keep mn/mx as DOUBLES — in-SQL CAST of float specials to
    # string diverges between engines ('Infinity'/'NaN' in Spark vs
    # 'inf'/'nan' in DuckDB), a seam the driver gate never crosses
    # because it stringifies through pandas on both sides. Oracles
    # must never CAST(float AS STRING); this fuzz pins the VALUES.
    sql = """
SELECT k,
  MIN(v) AS mn,
  MAX(v) AS mx,
  COUNT(v) AS n_nonnull
FROM t GROUP BY k
"""
    s, d = _both(spark, duck, pdf, sql, sql)
    assert s == d


def test_collation_ascii_parity_fuzz(spark, duck):
    # UTF8_LCASE equality vs DuckDB lower()= over random ASCII
    # including the characters ADJACENT to the letter ranges
    # (@ [ \\ ] ^ _ ` { | } ~) — exactly where an |0x20-style
    # case-fold implementation slips. The q95 gate's data is ASCII,
    # so full parity on this domain is the load-bearing contract.
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789@[\\]^_`{|}~ #"
    )
    for seed in (13, 59):
        rng = random.Random(seed)
        strs = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9)))
            for _ in range(150)
        ]
        probe = rng.choice(strs).swapcase()
        pdf = pd.DataFrame({"s": strs})
        spark_sql = f"""
SELECT COUNT(*) FILTER (
         WHERE s COLLATE UTF8_LCASE = '{probe}'
       ) AS n_eq,
       COUNT(DISTINCT s COLLATE UTF8_LCASE) AS n_ci_distinct
FROM t
"""
        duck_sql = f"""
SELECT COUNT(*) FILTER (WHERE lower(s) = lower('{probe}')) AS n_eq,
       COUNT(DISTINCT lower(s)) AS n_ci_distinct
FROM t
"""
        s, d = _both(spark, duck, pdf, spark_sql, duck_sql)
        assert s == d, f"seed={seed} probe={probe!r}"


def test_collation_unicode_pins(spark):
    # pin Spark's actual UTF8_LCASE semantics on the classic traps,
    # so an engine upgrade that changes collation behavior surfaces
    # here before it reaches a gate query: UTF8_LCASE lowercases
    # (plus final-sigma folding) but is NOT full case folding — 'ß'
    # is NOT equal to 'SS' and ligatures don't expand, while
    # dotted-capital İ equals i+combining dot because both lowercase
    # to the same sequence
    rows = [
        ("ß", "SS", False),  # lower('ß')='ß' vs 'ss'
        ("ß", "ß", True),
        ("İ", "i̇", True),  # U+0130 lowers to i + U+0307
        ("İ", "i", False),
        ("Σ", "σ", True),
        # UTF8_LCASE folds GREEK FINAL SIGMA (ICU-style folding) even
        # though lower('Σ') = 'σ' != 'ς' — the one place where the
        # collation is STRONGER than an explicit lower() rewrite, so
        # no oracle may emulate UTF8_LCASE with lower() on Greek text
        ("Σ", "ς", True),
        ("ﬀ", "ff", False),  # ligature still needs full-width folding
        ("STRASSE", "strasse", True),
    ]
    pdf = pd.DataFrame(
        [(a, b) for a, b, _ in rows], columns=["a", "b"]
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    got = [
        r.eq
        for r in spark.sql(
            "SELECT a COLLATE UTF8_LCASE = b AS eq FROM t"
        ).collect()
    ]
    assert got == [want for _, _, want in rows], list(
        zip([f"{a!r}={b!r}" for a, b, _ in rows], got)
    )
