"""Temporal join operators (operators/joins.py): as-of semantics
(backward/forward, exact-ts, no-match nulls) and bucketed range-join
boundary behavior."""

from __future__ import annotations

from map_reduce_project_spark.operators.joins import (
    asof_join,
    interval_point_join,
)


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("A", 10, 1.0),
            ("A", 20, 2.0),
            ("A", 30, 3.0),
            ("B", 15, 9.0),
        ],
        "sym string, qts long, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            ("A", 5),    # before any quote -> null (backward)
            ("A", 20),   # exact match -> quote@20
            ("A", 25),   # between -> quote@20
            ("A", 99),   # after all -> quote@30
            ("B", 14),   # before B's only quote -> null
            ("C", 50),   # key with no quotes at all -> null
        ],
        "sym string, tts long",
    )


def test_asof_backward(spark):
    out = asof_join(
        _trades(spark), _quotes(spark),
        key_cols=["sym"], left_ts="tts", right_ts="qts",
    )
    got = {(r.sym, r.tts): (r.right_qts, r.right_px) for r in out.collect()}
    assert got == {
        ("A", 5): (None, None),
        ("A", 20): (20, 2.0),   # <= includes the exact timestamp
        ("A", 25): (20, 2.0),
        ("A", 99): (30, 3.0),
        ("B", 14): (None, None),
        ("C", 50): (None, None),
    }
    # left-join semantics: every left row survives
    assert out.count() == 6


def test_asof_forward(spark):
    out = asof_join(
        _trades(spark), _quotes(spark),
        key_cols=["sym"], left_ts="tts", right_ts="qts",
        direction="forward",
    )
    got = {(r.sym, r.tts): r.right_qts for r in out.collect()}
    assert got == {
        ("A", 5): 10,
        ("A", 20): 20,  # >= includes the exact timestamp
        ("A", 25): 30,
        ("A", 99): None,
        ("B", 14): 15,
        ("C", 50): None,
    }


def test_interval_point_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 99), (5, 350)],
        "pid long, x long",
    )
    intervals = spark.createDataFrame(
        # [100, 200) spans two width-75 buckets; [300, 300) is empty
        [(10, 100, 200), (11, 300, 300)],
        "ivid long, lo long, hi long",
    )
    out = interval_point_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=75,
    )
    got = {(r.pid, r.iv_ivid) for r in out.collect()}
    # lo inclusive (100), hi exclusive (200), empty interval matches
    # nothing, each match appears exactly once despite multi-bucket
    # interval replication
    assert got == {(1, 10), (2, 10)}


def test_interval_point_join_wide_interval(spark):
    # interval much wider than the bucket: replicated into many
    # buckets, every covered point matches exactly once
    points = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "pid long, x long"
    )
    intervals = spark.createDataFrame([(1, 25, 155)], "ivid long, lo long, hi long")
    out = interval_point_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=10,
    )
    rows = out.collect()
    assert {r.pid for r in rows} == {i for i in range(20) if 25 <= i * 10 < 155}
    assert len(rows) == len({r.pid for r in rows})  # no duplicates


def test_cogroup_merge_asof_equals_native_asof_join(spark):
    """The cogrouped pandas merge_asof twin (queries/temporal.py) must
    emit exactly what the native window as-of join emits, including
    users with purchases but no clicks (null match), clicks but no
    purchases (no rows), and exact-timestamp ties (right side deduped
    per ts, max event_id wins)."""
    import random

    from pyspark.sql import functions as F

    from map_reduce_project_spark.operators.joins import asof_join

    rng = random.Random(7)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randint(0, 8)):
            eid += 1
            kind = rng.choice(["click", "purchase"])
            ts = f"2024-01-01 00:{rng.randint(0, 59):02d}:00"
            rows.append((eid, user, kind, ts))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))

    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    native = asof_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        direction="backward",
    ).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("right_click_id").alias("click_id"),
        F.col("right_ts").alias("click_ts"),
    )

    # rebuild the cogrouped twin on the same inputs
    from map_reduce_project_spark.queries.temporal import (
        ASOF_COGROUP_SCHEMA,
    )
    import pandas as pd

    clicks2 = clicks.select(
        "user_id", F.col("ts").alias("click_ts"), "click_id"
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

    cogrouped = (
        purchases.groupBy("user_id")
        .cogroup(clicks2.groupBy("user_id"))
        .applyInPandas(merge, schema=ASOF_COGROUP_SCHEMA)
    )

    key = lambda r: (
        r["purchase_id"],
        r["user_id"],
        str(r["purchase_ts"]),
        r["click_id"],
        str(r["click_ts"]),
    )
    assert sorted(map(key, native.collect())) == sorted(
        map(key, cogrouped.collect())
    )


def test_interval_overlap_join_matches_brute_force(spark):
    """Bucketed overlap join must equal the O(n*m) nested-loop answer
    on random intervals — including duplicates NOT appearing when a
    pair shares several buckets, zero-length intervals dropped, and
    touching-but-not-overlapping endpoints excluded (half-open)."""
    import random

    from map_reduce_project_spark.operators.joins import (
        interval_overlap_join,
    )

    rng = random.Random(11)
    lrows = []
    for i in range(40):
        lo = rng.randint(0, 300)
        lrows.append((i, lo, lo + rng.randint(0, 90)))
    rrows = []
    for j in range(40):
        lo = rng.randint(0, 300)
        rrows.append((j, lo, lo + rng.randint(0, 90)))
    left = spark.createDataFrame(lrows, "lid long, llo long, lhi long")
    right = spark.createDataFrame(rrows, "rid long, rlo long, rhi long")
    got = sorted(
        (r.lid, r.ov_rid)
        for r in interval_overlap_join(
            left, right, "llo", "lhi", "rlo", "rhi", bucket_width=25
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, llo, lhi in lrows
        for j, rlo, rhi in rrows
        if lhi > llo and rhi > rlo and llo < rhi and rlo < lhi
    )
    assert got == want and len(got) == len(set(got))


def test_asof_both_directions_match_pandas_on_random_input(spark):
    """asof_join backward AND forward vs pandas.merge_asof on random
    per-key series — covers empty right sides, ties, and
    before-first/after-last probes in both directions."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from map_reduce_project_spark.operators.joins import asof_join

    rng = random.Random(23)
    lrows, rrows = [], []
    for key in range(8):
        for i in range(rng.randint(0, 6)):
            lrows.append((key * 100 + i, key, rng.randint(0, 1000)))
        for i in range(rng.randint(0, 6)):
            rrows.append((key * 100 + 50 + i, key, rng.randint(0, 1000)))
    left = spark.createDataFrame(lrows, "lid long, k long, lts long")
    right = (
        spark.createDataFrame(rrows, "rid long, k long, rts long")
        .groupBy("k", "rts")
        .agg(F.max("rid").alias("rid"))
        .select("rid", "k", "rts")
    )
    rpdf = right.toPandas()

    for direction in ("backward", "forward"):
        got = {
            (r.lid, r.right_rid if r.right_rid is not None else -1)
            for r in asof_join(
                left,
                right,
                key_cols=["k"],
                left_ts="lts",
                right_ts="rts",
                direction=direction,
            ).collect()
        }
        want = set()
        for lid, k, lts in lrows:
            cand = rpdf[rpdf.k == k]
            if direction == "backward":
                cand = cand[cand.rts <= lts].sort_values(["rts", "rid"])
                pick = cand.iloc[-1]["rid"] if len(cand) else -1
            else:
                cand = cand[cand.rts >= lts].sort_values(["rts", "rid"])
                pick = cand.iloc[0]["rid"] if len(cand) else -1
            want.add((lid, int(pick)))
        assert got == want, direction


def test_interval_point_join_negative_and_int64_edge(spark):
    # bucket ids must be exact integer floor-division: negative
    # coordinates floor toward -inf (SQL `div` alone truncates toward
    # zero), and values beyond 2^53 are outside double precision, so
    # a float-division bucket id could round differently on the point
    # and interval sides and drop matching pairs
    big = (1 << 53) + 1  # not representable as a double
    points = spark.createDataFrame(
        [(1, -151), (2, -150), (3, -1), (4, 0), (5, big), (6, big + 149)],
        "pid long, x long",
    )
    intervals = spark.createDataFrame(
        [(10, -150, 0), (11, big, big + 150)],
        "ivid long, lo long, hi long",
    )
    out = interval_point_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=100,
    )
    got = sorted((r.pid, r.iv_ivid) for r in out.collect())
    want = sorted(
        (pid, ivid)
        for pid, x in [(1, -151), (2, -150), (3, -1), (4, 0), (5, big), (6, big + 149)]
        for ivid, lo, hi in [(10, -150, 0), (11, big, big + 150)]
        if lo <= x < hi
    )
    assert got == want
    assert (2, 10) in got and (3, 10) in got and (5, 11) in got


def test_interval_overlap_join_negative_coords(spark):
    from map_reduce_project_spark.operators.joins import (
        interval_overlap_join,
    )

    lrows = [(1, -120, -30), (2, -10, 25)]
    rrows = [(7, -45, -40), (8, -30, 5), (9, 20, 60)]
    left = spark.createDataFrame(lrows, "lid long, llo long, lhi long")
    right = spark.createDataFrame(rrows, "rid long, rlo long, rhi long")
    got = sorted(
        (r.lid, r.ov_rid)
        for r in interval_overlap_join(
            left, right, "llo", "lhi", "rlo", "rhi", bucket_width=50
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, llo, lhi in lrows
        for j, rlo, rhi in rrows
        if llo < rhi and rlo < lhi
    )
    assert got == want


def test_asof_nearest_matches_python_oracle(spark):
    """Randomized check of asof_join_nearest incl. exact-distance
    ties (backward must win) and equal-timestamp right rows
    (distance 0, backward by the window-order convention)."""
    import datetime as dt
    import random

    from map_reduce_project_spark.operators.joins import asof_join_nearest

    base = dt.datetime(2024, 1, 1)
    for seed in (11, 47, 83):
        rng = random.Random(seed)
        lefts, rights = [], []
        for k in ("a", "b"):
            # coarse second grid => plenty of ties and collisions
            for i in range(25):
                lefts.append((f"L{k}{i}", k, base + dt.timedelta(seconds=rng.randrange(50))))
            seen = set()
            for i in range(15):
                t = rng.randrange(50)
                if (k, t) in seen:  # dedup per (key, ts): operator contract
                    continue
                seen.add((k, t))
                rights.append((f"R{k}{i}", k, base + dt.timedelta(seconds=t)))
        ldf = spark.createDataFrame(lefts, "lid string, k string, lts timestamp")
        rdf = spark.createDataFrame(rights, "rid string, k string, rts timestamp")
        out = asof_join_nearest(
            ldf, rdf, key_cols=["k"], left_ts="lts", right_ts="rts"
        )
        got = {r["lid"]: r["right_rid"] for r in out.collect()}
        want = {}
        for lid, k, lts in lefts:
            best = None
            for rid, rk, rts in rights:
                if rk != k:
                    continue
                d = abs((rts - lts).total_seconds())
                back = rts <= lts
                # order: distance, then backward-first
                cand = (d, 0 if back else 1, rid)
                if best is None or cand < best:
                    best = cand
                    want[lid] = rid
            if best is None:
                want[lid] = None
        assert got == want, f"seed={seed}"


def test_asof_directional_matches_python_oracle(spark):
    """Randomized check of asof_join backward/forward incl.
    equal-timestamp rows: backward is <= (an equal-ts right row
    matches), forward is >= — the boundary DuckDB's ASOF oracle only
    exercises where the data happens to collide."""
    import datetime as dt
    import random

    from map_reduce_project_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)
    for seed in (7, 29):
        rng = random.Random(seed)
        lefts, rights = [], []
        for k in ("a", "b"):
            for i in range(20):
                lefts.append(
                    (f"L{k}{i}", k, base + dt.timedelta(seconds=rng.randrange(40)))
                )
            seen = set()
            for i in range(12):
                t = rng.randrange(40)
                if (k, t) in seen:
                    continue
                seen.add((k, t))
                rights.append(
                    (f"R{k}{i}", k, base + dt.timedelta(seconds=t))
                )
        ldf = spark.createDataFrame(lefts, "lid string, k string, lts timestamp")
        rdf = spark.createDataFrame(rights, "rid string, k string, rts timestamp")
        for direction in ("backward", "forward"):
            out = asof_join(
                ldf, rdf, ["k"], "lts", "rts", direction=direction
            )
            got = {r["lid"]: r["right_rid"] for r in out.collect()}
            want = {}
            for lid, k, lts in lefts:
                best = None
                for rid, rk, rts in rights:
                    if rk != k:
                        continue
                    if direction == "backward":
                        if rts > lts:
                            continue
                        cand = (-(rts - base).total_seconds(), rid)
                    else:
                        if rts < lts:
                            continue
                        cand = ((rts - base).total_seconds(), rid)
                    if best is None or cand < best:
                        best = cand
                        want[lid] = rid
                if best is None:
                    want[lid] = None
            assert got == want, f"{direction} seed={seed}"


def test_asof_duplicate_timestamps_both_sides(spark):
    """Duplicate timestamps on BOTH sides: every left row (including
    exact-duplicate left rows) must match a right row at the
    oracle-best timestamp — the matched rid may be any of the rows
    tied AT that timestamp (the documented pre-dedup contract), but
    the matched timestamp itself is fully determined, and rows with
    no candidate must be null. Runs backward, forward, and nearest."""
    import datetime as dt
    import random

    from map_reduce_project_spark.operators.joins import (
        asof_join,
        asof_join_nearest,
    )

    base = dt.datetime(2024, 1, 1)
    for seed in (19, 73):
        rng = random.Random(seed)
        lefts, rights = [], []
        n_l = n_r = 0
        for k in ("a", "b"):
            # tiny timestamp domain -> many collisions on both sides,
            # including left rows exactly ON duplicated right rows
            for _ in range(24):
                lefts.append(
                    (f"L{n_l}", k, base + dt.timedelta(seconds=rng.randrange(10)))
                )
                n_l += 1
            for _ in range(14):
                rights.append(
                    (f"R{n_r}", k, base + dt.timedelta(seconds=rng.randrange(10)))
                )
                n_r += 1
        ldf = spark.createDataFrame(lefts, "lid string, k string, lts timestamp")
        rdf = spark.createDataFrame(rights, "rid string, k string, rts timestamp")
        rid_ts = {rid: (k, ts) for rid, k, ts in rights}

        def check(out_rows, want_ts):
            got = {r["lid"]: r["right_rid"] for r in out_rows}
            assert set(got) == set(want_ts)
            for lid, k, lts in lefts:
                w = want_ts[lid]
                rid = got[lid]
                if w is None:
                    assert rid is None, (lid, rid)
                else:
                    assert rid is not None, (lid, w)
                    rk, rts = rid_ts[rid]
                    assert rk == k and rts == w, (lid, rid, rts, w)

        for direction in ("backward", "forward"):
            out = asof_join(ldf, rdf, ["k"], "lts", "rts", direction=direction)
            want_ts = {}
            for lid, k, lts in lefts:
                cands = [
                    rts
                    for rid, rk, rts in rights
                    if rk == k
                    and (rts <= lts if direction == "backward" else rts >= lts)
                ]
                want_ts[lid] = (
                    (max(cands) if direction == "backward" else min(cands))
                    if cands
                    else None
                )
            check(out.collect(), want_ts)

        out = asof_join_nearest(ldf, rdf, ["k"], "lts", "rts")
        want_ts = {}
        for lid, k, lts in lefts:
            cands = [(abs((rts - lts).total_seconds()), rts <= lts, rts)
                     for rid, rk, rts in rights if rk == k]
            if not cands:
                want_ts[lid] = None
                continue
            best_d = min(c[0] for c in cands)
            tied = [c for c in cands if c[0] == best_d]
            # backward candidate wins exact-distance ties
            back = [c for c in tied if c[1]]
            want_ts[lid] = (back[0][2] if back else tied[0][2])
        check(out.collect(), want_ts)
