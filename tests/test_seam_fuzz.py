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
        # .astype(str) like the driver gate (NOT per-cell str():
        # astype formats midnight datetime64 as a bare date, which is
        # how date-typed results actually compare in the gate)
        x = x[sorted(x.columns)].astype(str)
        rows = [tuple(r) for r in x.itertuples(index=False, name=None)]
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


def test_round_half_tie_parity_and_bround_seam(spark, duck):
    # ROUND at exact .5 ties: both engines round DECIMAL inputs
    # HALF_UP (away from zero) at every scale — fuzzed with
    # multiplication-built decimals (scale-3 thousandths) so ties
    # land on every rounding digit. DIVISION is excluded on purpose:
    # DuckDB's `/` on DECIMAL yields DOUBLE (typeof(dec/int) =
    # DOUBLE), so ROUND-after-divide rounds a binary approximation
    # there while Spark stays decimal-exact — 9.165 rounds to 9.17
    # on Spark and 9.16 on DuckDB. That divergence and Spark-only
    # bround (HALF_EVEN) are pinned below so no gated oracle ever
    # uses either pattern.
    for seed in (7, 29):
        rng = random.Random(seed)
        mills = [rng.randrange(-4000, 4000) * 5 for _ in range(200)]
        pdf = pd.DataFrame({"id": range(len(mills)), "c": mills})
        # c * 0.001 in pure decimal arithmetic: DECIMAL * DECIMAL
        # stays DECIMAL in both engines (only division defects to
        # DOUBLE in DuckDB)
        sql = """
SELECT id,
  ROUND(CAST(c AS DECIMAL(14,0)) * CAST(0.001 AS DECIMAL(4,3)), 2) AS r2,
  ROUND(CAST(c AS DECIMAL(14,0)) * CAST(0.001 AS DECIMAL(4,3)), 1) AS r1,
  ROUND(CAST(c AS DECIMAL(14,0)) * CAST(0.001 AS DECIMAL(4,3)), 0) AS r0
FROM t
"""
        # decimal scales differ across engines ('1.3' vs '1.30'):
        # compare as doubles, the convention every gated oracle uses
        wrap = lambda q: (
            "SELECT id, CAST(r1 AS DOUBLE) AS r1, CAST(r0 AS DOUBLE) AS r0,"
            f" CAST(r2 AS DOUBLE) AS r2 FROM ({q})"
        )
        s, d = _both(spark, duck, pdf, wrap(sql), wrap(sql))
        assert s == d, f"seed={seed}"

    # the division seam itself: same SQL text, different engines'
    # type systems. Spark: DECIMAL/INT stays DECIMAL, exact 9.165,
    # HALF_UP -> 9.17. DuckDB: DECIMAL/INT is DOUBLE, binary value
    # 9.16499..., rounds -> 9.16.
    div_sql = "SELECT ROUND(CAST(9165 AS DECIMAL(14,2)) / 1000, 2) AS r"
    assert str(spark.sql(div_sql).collect()[0].r) == "9.17"
    assert str(duck.execute(div_sql).fetchone()[0]) == "9.16"

    # double ROUND near a representational tie: Spark rounds the
    # SHORTEST DECIMAL REPR of the double (BigDecimal.valueOf ->
    # "9.165" -> HALF_UP -> 9.17); DuckDB rounds the true binary
    # value (9.1649999... -> 9.16). ROUND(double) in a gated oracle
    # is therefore only safe away from .xx5 ties.
    dbl_sql = "SELECT ROUND(CAST(9.165 AS DOUBLE), 2) AS r"
    assert float(spark.sql(dbl_sql).collect()[0].r) == 9.17
    assert float(duck.execute(dbl_sql).fetchone()[0]) == 9.16

    # the bround seam: HALF_EVEN on the tie, Spark-only
    row = spark.sql(
        "SELECT bround(CAST(1.25 AS DECIMAL(12,2)), 1) AS be,"
        " round(CAST(1.25 AS DECIMAL(12,2)), 1) AS hu"
    ).collect()[0]
    assert str(row.be) == "1.2" and str(row.hu) == "1.3"


def test_try_cast_numeric_string_seam(spark, duck):
    # TRY_CAST(string AS INT) diverges on anything non-integral:
    # DuckDB parses via double then ROUNDS ('12.5'->13, '1e2'->100,
    # '0x1A'->26); Spark returns NULL for all three. Gated oracles
    # must therefore only TRY_CAST strings that are either clean
    # integers or clearly non-numeric — pinned here so the trap is
    # executable documentation, with the agreeing classes fuzzed.
    cases = ["12.5", "1e2", "0x1A", "2.0"]
    pdf = pd.DataFrame({"s": cases})
    s, d = _both(
        spark, duck, pdf,
        "SELECT s, TRY_CAST(s AS INT) AS v FROM t",
        "SELECT s, TRY_CAST(s AS INT) AS v FROM t",
    )
    # all-NULL int column round-trips through pandas as float NaN
    assert [r[1] for r in s] == ["nan"] * 4, s
    # canon sorts rows by the string column: 0x1A, 12.5, 1e2, 2.0
    assert [r[1] for r in d] == ["26", "13", "100", "2"], d

    # agreeing classes: optionally-signed clean integers (with
    # surrounding whitespace) and non-numeric garbage
    for seed in (13, 41):
        rng = random.Random(seed)
        pool = [
            str(rng.randrange(-10**9, 10**9)),
            f"  {rng.randrange(0, 999)} ",
            f"+{rng.randrange(0, 999)}",
            "order-" + str(rng.randrange(99)),
            "URGENT",
            "",
        ]
        vals = [rng.choice(pool) for _ in range(120)]
        pdf = pd.DataFrame({"id": range(len(vals)), "s": vals})
        sql = "SELECT id, TRY_CAST(s AS BIGINT) AS v FROM t"
        s, d = _both(spark, duck, pdf, sql, sql)
        assert s == d, f"seed={seed}"


def test_mod_div_negative_parity(spark, duck):
    # % and integer division on negative operands: both engines
    # truncate toward zero and give % the dividend's sign — fuzzed
    # across sign combinations and magnitudes, because one silent
    # floor-division engine would shift every negative-key bucketing
    # and hash-partitioning oracle in the repo.
    for seed in (19, 53):
        rng = random.Random(seed)
        rows = [
            (
                rng.randrange(-10**12, 10**12),
                rng.choice([1, -1]) * rng.randrange(1, 10**6),
            )
            for _ in range(300)
        ]
        pdf = pd.DataFrame(rows, columns=["a", "b"])
        s, d = _both(
            spark, duck, pdf,
            "SELECT a, b, a % b AS m, a DIV b AS q FROM t",
            "SELECT a, b, a % b AS m, CAST(a // b AS BIGINT) AS q FROM t",
        )
        assert s == d, f"seed={seed}"


def test_date_arithmetic_parity(spark, duck):
    # add_months/interval month-end clamping (Jan 31 + 1m = Feb 29),
    # ISO Monday week truncation across year boundaries, quarter
    # truncation, datediff, last_day — fuzzed over dates concentrated
    # on month ends and the first days of January.
    import datetime as _dt

    for seed in (3, 37):
        rng = random.Random(seed)
        iso = []
        for _ in range(150):
            y = rng.randrange(1995, 2031)
            m = rng.randrange(1, 13)
            d = rng.choice([1, 2, 27, 28, 29, 30, 31, rng.randrange(1, 29)])
            try:
                iso.append(str(_dt.date(y, m, d)))
            except ValueError:
                pass  # Feb 30 etc. — the month-end bias stays
        pdf = pd.DataFrame({"s": iso, "n": [
            rng.randrange(-30, 31) for _ in iso
        ]})
        # Spark date_trunc returns TIMESTAMP and DuckDB DATE+INTERVAL
        # returns TIMESTAMP — CAST every derived column to DATE so
        # the comparison is on civil dates, the thing under test
        spark_sql = """
SELECT s, n,
  add_months(CAST(s AS DATE), n) AS am,
  CAST(CAST(s AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus1m,
  CAST(date_trunc('week', CAST(s AS DATE)) AS DATE) AS wk,
  CAST(date_trunc('quarter', CAST(s AS DATE)) AS DATE) AS qt,
  last_day(CAST(s AS DATE)) AS ld,
  datediff(CAST(s AS DATE), DATE '2020-01-01') AS dd
FROM t
"""
        duck_sql = """
SELECT s, n,
  CAST(CAST(s AS DATE) + n * INTERVAL 1 MONTH AS DATE) AS am,
  CAST(CAST(s AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus1m,
  CAST(date_trunc('week', CAST(s AS DATE)) AS DATE) AS wk,
  CAST(date_trunc('quarter', CAST(s AS DATE)) AS DATE) AS qt,
  last_day(CAST(s AS DATE)) AS ld,
  datediff('day', DATE '2020-01-01', CAST(s AS DATE)) AS dd
FROM t
"""
        s, d = _both(spark, duck, pdf, spark_sql, duck_sql)
        assert s == d, f"seed={seed}"


def test_regexp_engine_parity_and_divergence_pins(spark, duck):
    # Spark compiles java.util.regex; DuckDB compiles RE2. The safe
    # shared subset — literals, \d/\w/\s classes, bracket classes,
    # greedy/lazy quantifiers, alternation, anchors, \b — agrees
    # (fuzzed below, including empty-match counting which both
    # engines advance identically). Outside it: lookahead and
    # backreferences FAIL LOUDLY on DuckDB (parse error), but POSIX
    # bracket names ([[:digit:]]) diverge SILENTLY (Java reads the
    # chars literally -> 0 matches where RE2 matches digits), so no
    # gated oracle may use any of the three.
    import duckdb as _duckdb

    assert spark.sql(
        "select regexp_count('foobar', 'foo(?=bar)')"
    ).collect()[0][0] == 1
    assert spark.sql(
        "select regexp_count('aa', '(a)\\\\1')"
    ).collect()[0][0] == 1
    for bad in (r"foo(?=bar)", r"(a)\1"):
        with pytest.raises(_duckdb.Error):
            duck.execute(
                f"select regexp_extract_all('x', '{bad}')"
            ).fetchall()
    # the silent ones: POSIX bracket names, and \b combined with an
    # EMPTY-MATCHABLE pattern (both engines allow zero-width matches
    # at word boundaries but enumerate them differently — found by
    # this test's own fuzz before the generator excluded the combo)
    assert spark.sql(
        "select regexp_count('a1', '[[:digit:]]')"
    ).collect()[0][0] == 0
    assert duck.execute(
        "select LEN(regexp_extract_all('a1', '[[:digit:]]'))"
    ).fetchone()[0] == 1
    assert spark.sql(
        r"select regexp_count('xcaa.2 aab', '\\b1*')"
    ).collect()[0][0] == 6
    assert duck.execute(
        r"select LEN(regexp_extract_all('xcaa.2 aab', '\b1*'))"
    ).fetchone()[0] == 8

    # fuzz the shared subset: random patterns over random subject
    # strings; parity on count, first-group extract, and match flag
    atoms = ["a", "b", "c", "1", r"\d", r"\w", r"\s", "[ab]", "[a-c1]", "."]
    quants = ["", "", "?", "*", "+", "{1,2}", "*?", "+?"]
    for seed in (11, 59, 83):
        rng = random.Random(seed)
        pats = []
        while len(pats) < 25:
            n = rng.randrange(1, 4)
            parts = [
                (rng.choice(atoms), rng.choice(quants)) for _ in range(n)
            ]
            pat = "".join(a + q for a, q in parts)
            if rng.random() < 0.3:
                pat = pat + "|" + rng.choice(atoms)
            # \b only guards a non-empty-matchable head: zero-width
            # matches AT boundaries enumerate differently (pinned
            # divergent above)
            if rng.random() < 0.2 and parts[0][1] in ("", "+", "{1,2}", "+?"):
                pat = r"\b" + pat
            pats.append(pat)
        subjects = [
            "".join(rng.choice("abc1 23.x") for _ in range(rng.randrange(0, 14)))
            for _ in range(40)
        ]
        pdf = pd.DataFrame(
            [(i, s, p) for i, s in enumerate(subjects) for p in pats],
            columns=["id", "s", "p"],
        )
        # one (subject, pattern) row per comparison; patterns ride a
        # column so one SQL text covers the whole grid
        sql = r"""
SELECT id, p,
  CAST(regexp_count(s, p) AS BIGINT) AS n,
  regexp_extract(s, '(' || p || ')', 1) AS g1
FROM t
"""
        duck_sql = r"""
SELECT id, p,
  CAST(LEN(regexp_extract_all(s, p)) AS BIGINT) AS n,
  COALESCE(regexp_extract(s, '(' || p || ')', 1), '') AS g1
FROM t
"""
        s_rows, d_rows = _both(spark, duck, pdf, sql, duck_sql)
        assert s_rows == d_rows, f"seed={seed}"


def test_canon_float_repr_boundaries(spark, duck):
    # The gate canonicalizes BOTH engines through pandas str(), so
    # the float-repr boundary itself is a seam: -0.0 stringifies as
    # '-0.0', 2^53+1 is not representable as double (an uncast
    # HUGEINT->float64 oracle result silently rounds), and 1e16
    # crosses pandas' int64-vs-float64 repr ('10000000000000000' vs
    # '1e+16'). This fuzz drives values ONTO those boundaries through
    # gate-style expressions (CAST AS BIGINT on every integer agg,
    # deterministic single-row float arithmetic) and requires exact
    # canon parity — proving the discipline the oracles follow
    # actually survives the boundary, not just typical values.
    big = 9007199254740993  # 2^53 + 1
    pdf = pd.DataFrame(
        {
            "k": [0, 0, 1, 1, 2, 3],
            "i": pd.array(
                [big, 1, 10**16 - 1, 1, -big, 0], dtype="int64"
            ),
            "f": [0.1, 0.2, -0.0, 0.0, 1e16, 2.0**53],
        }
    )
    sql = """
SELECT k,
  CAST(SUM(i) AS BIGINT) AS si,          -- > 2^53: dies if floated
  CAST(MIN(i) AS BIGINT) AS mi,
  SUM(f) AS sf                            -- deterministic per-group:
                                          -- <=2 addends per group
FROM t GROUP BY k
"""
    s, d = _both(spark, duck, pdf, sql, sql)
    assert s == d
    # the guarded sums really sit past the double cliff
    assert any("9007199254740994" in "".join(r) for r in s)


def test_canon_negative_zero_seam(spark, duck):
    # -0.0-producing expressions: both engines must agree VALUE-wise
    # (str(-0.0) = '-0.0' != '0.0' under the gate canon). IEEE says
    # (-0.0) + 0.0 = 0.0 but (-0.0) + (-0.0) = -0.0, and a negative
    # product/quotient that rounds to zero is -0.0; any engine that
    # "helpfully" normalizes signed zeros diverges here.
    pdf = pd.DataFrame({"x": [-0.0, -0.0, 0.0, -1e-300, 5.0]})
    sql = """
SELECT
  SUM(x) FILTER (WHERE x <= 0) AS s_nonpos,
  MIN(x) AS mn,
  SUM(CASE WHEN x < 0 THEN x * 0.5 ELSE 0.0 END) AS s_prod
FROM t
"""
    s, d = _both(spark, duck, pdf, sql, sql)
    assert s == d
    # and the seam is REAL: a signed zero actually flowed through
    flat = "".join("".join(r) for r in s)
    assert "-0.0" in flat or "-5e-301" in flat


def test_timestamp_offset_parsing_parity(spark, duck):
    # All committed testdata is UTC-naive; this fuzz exercises the
    # path it never touches — timestamp STRINGS carrying explicit
    # UTC offsets (+05:30, -08:00, Z) — and requires both engines to
    # normalize them to the same UTC-naive instant under the gate
    # canon. Spark parses via to_timestamp pattern XXX in the
    # session TZ (UTC on the gate box); DuckDB via TIMESTAMPTZ cast,
    # then CAST to naive TIMESTAMP. tz-AWARE results are themselves a
    # canon seam (pandas str() appends '+00:00'), so the contract
    # pinned here is: oracles always CAST tz-aware back to TIMESTAMP.
    rows = [
        "2021-03-14 01:30:00-05:00",  # 30 min before US DST gap
        "2021-03-14 03:30:00-04:00",  # 30 min after (EDT)
        "2021-11-07 01:30:00-04:00",  # first 01:30 (fold, EDT)
        "2021-11-07 01:30:00-05:00",  # second 01:30 (fold, EST)
        "2024-02-29 23:59:59+14:00",  # leap day at max legal offset
        "1969-12-31 18:30:00-05:30",  # pre-epoch, -05:30
        "2021-06-01 00:00:00+00:00",
    ]
    pdf = pd.DataFrame({"s": rows})
    spark_sql = """
SELECT s,
  CAST(to_timestamp(s, 'yyyy-MM-dd HH:mm:ssXXX') AS TIMESTAMP_NTZ)
    AS utc_ts,
  unix_timestamp(to_timestamp(s, 'yyyy-MM-dd HH:mm:ssXXX')) AS epoch
FROM t
"""
    duck_sql = """
SELECT s,
  CAST(CAST(s AS TIMESTAMPTZ) AS TIMESTAMP) AS utc_ts,
  CAST(epoch(CAST(s AS TIMESTAMPTZ)) AS BIGINT) AS epoch
FROM t
"""
    s, d = _both(spark, duck, pdf, spark_sql, duck_sql)
    assert s == d
    # the two DST-fold wall clocks really map to DIFFERENT instants
    epochs = {r[-1] for r in s if "2021-11-07" in r[1]}
    assert len(epochs) == 2


def test_dst_transition_pins_sparkside(spark):
    # Java-tzdb pins across the US 2021 spring-forward gap: the UTC
    # instants 06:59 and 07:00 straddle the jump (01:59 EST ->
    # 03:00 EDT; 02:xx does not exist). DuckDB needs the ICU
    # extension for named zones (absent offline), so like the
    # collation pins this is a Spark-side contract pin, not a parity
    # fuzz: an engine/tzdb upgrade that moves the boundary fails here
    # before it can reach any future tz-aware gate query.
    rows = spark.sql(
        """
SELECT
  CAST(from_utc_timestamp(TIMESTAMP'2021-03-14 06:59:00',
       'America/New_York') AS STRING) AS before_gap,
  CAST(from_utc_timestamp(TIMESTAMP'2021-03-14 07:00:00',
       'America/New_York') AS STRING) AS after_gap,
  CAST(from_utc_timestamp(TIMESTAMP'2021-11-07 05:30:00',
       'America/New_York') AS STRING) AS fold_first,
  CAST(from_utc_timestamp(TIMESTAMP'2021-11-07 06:30:00',
       'America/New_York') AS STRING) AS fold_second
"""
    ).collect()[0]
    assert rows.before_gap == "2021-03-14 01:59:00"
    assert rows.after_gap == "2021-03-14 03:00:00"  # 02:00 skipped
    # the fold hour repeats: both UTC instants show 01:30 local
    assert rows.fold_first == rows.fold_second == "2021-11-07 01:30:00"


def test_unicode_normalizer_parity_fuzz(spark, duck):
    # the dedup_normalized normalizer (lower + [^a-z0-9]+ -> ' ' +
    # trim) run over NON-ASCII: NFC/NFD pairs, sharp s, final sigma,
    # full-width letters, combining marks. Committed testdata is
    # ASCII, so this pins the BOUNDARY: both engines normalize
    # identical bytes identically on this domain, and NFC vs NFD
    # variants (both) survive as distinct pre-normalization inputs —
    # neither engine applies Unicode normalization implicitly.
    # U+0130 is EXCLUDED here: it is a REAL lower() divergence this
    # fuzz found, pinned separately below.
    import unicodedata

    base = "Café SONDERANGEBOT Istanbul Σοφός ＡＢ straße"
    variants = [
        base,
        unicodedata.normalize("NFD", base),
        unicodedata.normalize("NFC", base),
        "plain ascii 42",
        "PLAIN ASCII 42!!",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(variants)), "text": variants})
    sql_spark = """
SELECT doc_id,
  TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ')) AS norm
FROM t
"""
    sql_duck = """
SELECT doc_id,
  TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
FROM t
"""
    s, d = _both(spark, duck, pdf, sql_spark, sql_duck)
    assert s == d
    # NFC and NFD collapse to the SAME normalized key here only
    # because the combining marks are non-[a-z0-9] and get spaced
    # away; the engines must agree on that too
    norms = {r[1] for r in s}
    assert "plain ascii 42" in norms


def test_lower_dotted_capital_i_divergence_pin(spark, duck):
    # FOUND BY THIS FUZZ (round 6): lower('İ') DIVERGES — Spark
    # (Java/ICU) applies the Unicode mapping U+0130 -> 'i' + U+0307
    # (combining dot above, two codepoints), DuckDB returns bare 'i'
    # (one codepoint). Through the dedup normalizer the combining
    # dot becomes a space on the Spark side only ('i stanbul' vs
    # 'istanbul'), so any oracle-gated query that lower()s text
    # containing U+0130 would hash-diverge. CONTRACT pinned here:
    # committed testdata text is ASCII, and no gate oracle may rely
    # on lower() agreement for U+0130 — if a future table carries
    # Turkish text, normalize it with an explicit translate/ICU pass
    # first. This pin fails loudly if either engine changes behavior.
    srow = spark.sql("SELECT lower('İstanbul') AS x").collect()[0].x
    drow = duck.execute("SELECT lower('İstanbul')").fetchone()[0]
    assert srow == "i̇stanbul"  # Spark: i + combining dot above
    assert drow == "istanbul"  # DuckDB: bare i
    assert srow != drow


def test_decimal_downcast_trunc_vs_halfup_divergence_pin(spark, duck):
    # FOUND BY THIS FUZZ (round 7): a bare DECIMAL -> DECIMAL
    # scale-REDUCING cast diverges systematically — Spark rounds
    # HALF_UP at the dropped digit (Decimal.toPrecision), DuckDB
    # TRUNCATES toward zero (1.115 -> 1.12 vs 1.11; 1.999 -> 2.00 vs
    # 1.99; symmetric for negatives). Any gated oracle that
    # scale-reduces a decimal with CAST alone would hash-diverge on
    # almost every row. CONTRACT: gated SQL must ROUND to the target
    # scale BEFORE casting (ROUND is HALF_UP in both engines — the
    # round-5 pin), or avoid scale reduction entirely; the repo's
    # committed oracles do the latter (audited round 7: every
    # DECIMAL(p,s) cast is scale-preserving or from DOUBLE).
    import decimal

    for seed in (11, 43):
        rng = random.Random(seed)
        mills = [rng.randrange(-99999, 99999) for _ in range(300)]
        pdf = pd.DataFrame({"id": range(len(mills)), "c": mills})
        bare = """
SELECT id, CAST(CAST(c AS DECIMAL(38,0)) / 1000 AS DECIMAL(38,3)) AS d3
FROM t
"""
        # build the scale-3 decimal identically (int/1000 is exact
        # decimal division in Spark; DuckDB decimal/int -> DOUBLE, so
        # construct via multiplication instead for byte-identical
        # inputs on both sides)
        mk = (
            "SELECT id, CAST(c AS DECIMAL(38,0)) *"
            " CAST(0.001 AS DECIMAL(4,3)) AS d3 FROM t"
        )
        cast_sql = (
            f"SELECT id, CAST(CAST(d3 AS DECIMAL(10,2)) AS DOUBLE)"
            f" AS x FROM ({mk})"
        )
        s, d = _both(spark, duck, pdf, cast_sql, cast_sql)
        # recompute both expectations host-side with decimal module
        exp_half_up = {}
        exp_trunc = {}
        for i, c in zip(pdf["id"], pdf["c"]):
            d3 = decimal.Decimal(c) / 1000
            exp_half_up[str(i)] = float(
                d3.quantize(
                    decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
                )
            )
            exp_trunc[str(i)] = float(
                d3.quantize(
                    decimal.Decimal("0.01"), rounding=decimal.ROUND_DOWN
                )
            )
        assert {r[0]: float(r[1]) for r in s} == exp_half_up, "Spark side"
        assert {r[0]: float(r[1]) for r in d} == exp_trunc, "DuckDB side"

        # the SAFE pattern: ROUND to target scale, THEN cast — exact
        # parity (both engines HALF_UP in ROUND over decimals)
        safe = (
            f"SELECT id, CAST(CAST(ROUND(d3, 2) AS DECIMAL(10,2))"
            f" AS DOUBLE) AS x FROM ({mk})"
        )
        s2, d2 = _both(spark, duck, pdf, safe, safe)
        assert s2 == d2, f"seed={seed}"

    # DOUBLE -> DECIMAL is NOT the same seam: both engines round the
    # double's shortest decimal repr HALF_UP ('1.005' -> 1.01 even
    # though the binary value is 1.00499...), so q96's
    # CAST(double AS DECIMAL(28,6)) pattern is parity-safe
    for lit in ("1.005", "0.285", "2.675", "1.5", "2.5", "-1.115"):
        sql = f"SELECT CAST(CAST('{lit}' AS DOUBLE) AS DECIMAL(10,2)) AS x"
        srow = str(spark.sql(sql).collect()[0].x)
        drow = str(duck.execute(sql).fetchone()[0])
        assert float(srow) == float(drow), (lit, srow, drow)


def test_unicode_casefold_expansion_divergence_pins(spark, duck):
    # FOUND BY THIS FUZZ (round 7), beyond round 6's U+0130: the
    # one-sided FULL case mappings. Java (Spark) applies Unicode
    # full casefolding — expansions allowed; DuckDB applies simple
    # per-codepoint mappings. CONTRACT (extends the U+0130 one): no
    # gated oracle may rely on upper()/lower() agreement outside
    # ASCII. These pins fail loudly if either engine changes.
    cases = [
        # (sql, spark_expect, duck_expect)
        ("upper('straße')", "STRASSE", "STRAẞE"),  # ß -> SS vs U+1E9E
        ("upper(lower('ẞ'))", "SS", "ẞ"),  # round-trip diverges
        ("lower('ΣΟΦΟΣ')", "σοφος", "σοφοσ"),  # final-sigma ς Spark-only
        ("upper('ﬁn')", "FIN", "ﬁN"),  # U+FB01 ligature expansion
        ("lower('İI')", "i̇i", "ii"),  # the round-6 U+0130 pin, composed
    ]
    for sql, s_exp, d_exp in cases:
        srow = spark.sql(f"SELECT {sql} AS x").collect()[0].x
        drow = duck.execute(f"SELECT {sql}").fetchone()[0]
        assert srow == s_exp, (sql, srow)
        assert drow == d_exp, (sql, drow)

    # PARITY on the simple one-to-one mappings: dotless i round trip
    # agrees (upper('ı') = 'I' both, lower back = 'i' both), and
    # random ASCII agrees everywhere — the domain the gate relies on
    for sql in ("upper('ı')", "lower(upper('ı'))", "upper('ςσ')"):
        srow = spark.sql(f"SELECT {sql} AS x").collect()[0].x
        drow = duck.execute(f"SELECT {sql}").fetchone()[0]
        assert srow == drow, (sql, srow, drow)
    rng = random.Random(5)
    ascii_strs = [
        "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(12)))
        .replace("'", "")
        .replace("\\", "")
        for _ in range(200)
    ]
    pdf = pd.DataFrame({"id": range(len(ascii_strs)), "s": ascii_strs})
    sql = "SELECT id, upper(s) AS u, lower(s) AS l FROM t"
    s, d = _both(spark, duck, pdf, sql, sql)
    assert s == d


def test_regexp_class_intersection_and_lookaround_divergence_pins(
    spark, duck
):
    # FOUND BY THIS FUZZ (round 7), beyond the round-5 RE2 seam:
    # with byte-identical patterns (shipped via a COLUMN — SQL
    # string-literal escaping itself diverges and would mask the
    # result), the two regex engines split on exactly the features
    # java.util.regex has and RE2 lacks (or vice versa). CONTRACT:
    # gated regex stays inside the common subset — no class
    # intersection [a&&b], no lookaround, no POSIX [[:class:]], no
    # \h, no script names — which scrub_pii/text_regexp_suite
    # already observe (round-5 audit).
    subject = "a-z]&b xyABab12 ABC_ 9"
    cases = [
        # (pattern, spark_match, duck_match)
        ("[a&&b]", "", "a"),  # Java intersection (empty) vs literal a/&/b
        ("[\\w&&[^_]]+", "a", "z]"),  # intersection vs literal-class
        ("a(?=b)", "a", ""),  # lookahead: Java only
        ("a(?!c)", "a", ""),
        ("(?<=x)y", "y", ""),  # lookbehind: Java only
        ("[[:digit:]]+", "", "12"),  # POSIX classes: RE2 only
        ("\\h", " ", ""),  # horizontal-ws escape: Java only
    ]
    pats = [c[0] for c in cases]
    pdf = pd.DataFrame({"i": range(len(pats)), "p": pats})
    spark.createDataFrame(pdf).createOrReplaceTempView("pt")
    duck.register("pt", pdf)
    for i, (pat, s_exp, d_exp) in enumerate(cases):
        srow = spark.sql(
            f"SELECT regexp_extract('{subject}', p, 0) AS x"
            f" FROM pt WHERE i = {i}"
        ).collect()[0].x
        drow = duck.execute(
            "SELECT regexp_extract(?, p, 0) FROM pt WHERE i = ?",
            [subject, i],
        ).fetchone()[0]
        assert srow == s_exp, (pat, srow)
        assert drow == d_exp, (pat, drow)

    # error-handling seam on DYNAMIC patterns: an invalid pattern in
    # a column RAISES in Spark but silently matches nothing in DuckDB
    # (bind-time compilation is impossible, and the row-level error
    # is swallowed) — a gated oracle with data-driven patterns would
    # not just diverge, it would diverge SILENTLY on one side
    bad = pd.DataFrame({"i": [0], "p": ["[b-a]"]})
    spark.createDataFrame(bad).createOrReplaceTempView("badp")
    duck.register("badp", bad)
    with pytest.raises(Exception, match="INVALID_PARAMETER_VALUE|PATTERN"):
        spark.sql(
            "SELECT regexp_extract('abc', p, 0) AS x FROM badp"
        ).collect()
    assert (
        duck.execute(
            "SELECT regexp_extract('abc', p, 0) FROM badp"
        ).fetchone()[0]
        == ""
    )


def test_month_arithmetic_end_of_month_parity(spark, duck):
    # month/year interval arithmetic at month-end boundaries: both
    # engines clamp to the last valid day (2024-01-31 + 1 month =
    # 2024-02-29), both lose the day on the way BACK (non-injective),
    # and both make chained +1+1 month DIFFER from +2 months
    # (2024-03-29 vs 2024-03-31 — the clamp makes month addition
    # non-associative, identically). The one divergence is TYPE:
    # DuckDB's DATE + INTERVAL yields TIMESTAMP (midnight) while
    # Spark stays DATE — so gated oracles must CAST interval results
    # back to DATE, which this fuzz does on both sides.
    import datetime

    rng = random.Random(13)
    dates = [
        datetime.date(2024, 1, 31),
        datetime.date(2024, 2, 29),
        datetime.date(2023, 2, 28),
        datetime.date(2024, 12, 31),
    ] + [
        datetime.date(
            rng.randrange(2000, 2030), rng.randrange(1, 13), d
        )
        for d in (28, 29, 30, 31)
        for _ in range(12)
        if d <= 28
    ]
    pdf = pd.DataFrame(
        {
            "id": range(len(dates)),
            "d": [x.isoformat() for x in dates],
            "m": [rng.randrange(-25, 26) for _ in dates],
        }
    )
    sql = """
SELECT id,
  CAST(CAST(d AS DATE) + m * INTERVAL 1 MONTH AS DATE) AS plus_m,
  CAST(CAST(d AS DATE) + INTERVAL 1 MONTH + INTERVAL 1 MONTH AS DATE)
    AS chain2,
  CAST(CAST(d AS DATE) + INTERVAL 2 MONTH AS DATE) AS direct2,
  last_day(CAST(d AS DATE)) AS eom
FROM t
"""
    dsql = """
SELECT id,
  CAST(CAST(d AS DATE) + to_months(CAST(m AS INT)) AS DATE) AS plus_m,
  CAST(CAST(d AS DATE) + INTERVAL 1 MONTH + INTERVAL 1 MONTH AS DATE)
    AS chain2,
  CAST(CAST(d AS DATE) + INTERVAL 2 MONTH AS DATE) AS direct2,
  last_day(CAST(d AS DATE)) AS eom
FROM t
"""
    s, d = _both(spark, duck, pdf, sql, dsql)
    assert s == d
    # the non-associativity itself, pinned on both engines equally
    row = spark.sql(
        "SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH"
        " + INTERVAL 1 MONTH AS DATE) AS c,"
        " CAST(DATE '2024-01-31' + INTERVAL 2 MONTH AS DATE) AS t"
    ).collect()[0]
    assert str(row.c) == "2024-03-29" and str(row.t) == "2024-03-31"
    drow = duck.execute(
        "SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH"
        " + INTERVAL 1 MONTH AS DATE),"
        " CAST(DATE '2024-01-31' + INTERVAL 2 MONTH AS DATE)"
    ).fetchone()
    assert str(drow[0]) == "2024-03-29" and str(drow[1]) == "2024-03-31"
