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
