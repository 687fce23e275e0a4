"""Count-min and Bloom sketch contracts: CM never undercounts and is
exact when a row of the table has no collisions for the key; Bloom
has zero false negatives at any sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_project_spark.operators.sketches import (
    bloom_bits,
    bloom_probe,
    count_min_estimate,
    count_min_table,
)


def test_count_min_never_undercounts(spark):
    rows = [(i % 17,) for i in range(500)] + [(99,)] * 40
    df = spark.createDataFrame(rows, "k long")
    cm = count_min_table(df, "k", depth=4, width=16)  # tight: collisions
    true = df.groupBy("k").agg(F.count("*").alias("true_n"))
    est = count_min_estimate(cm, true, "k", depth=4, width=16)
    out = est.collect()
    assert len(out) == 18
    for r in out:
        assert r["cm_est"] >= r["true_n"]
    # the heavy hitter is estimated within the CM additive bound even
    # at this tiny width (eps*N with eps=e/16 ~ 0.17 -> bound ~92)
    hh = [r for r in out if r["k"] == 99][0]
    assert hh["true_n"] <= hh["cm_est"] <= hh["true_n"] + 92


def test_count_min_table_is_bounded(spark):
    df = spark.range(10_000).selectExpr("id % 997 AS k")
    cm = count_min_table(df, "k", depth=4, width=64)
    assert cm.count() <= 4 * 64
    # cell-wise total per row d equals the input size (mass preserved)
    per_d = cm.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    assert {r["s"] for r in per_d} == {10_000}


def test_bloom_no_false_negatives(spark):
    members = spark.range(200).selectExpr("CAST(id AS STRING) AS k")
    bits = bloom_bits(members, "k", n_bits=256, n_hashes=5)  # saturated
    probed = bloom_probe(bits, members, "k", n_bits=256, n_hashes=5)
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_duplicate_probes_keep_cardinality_and_hit(spark):
    # Regression: duplicate probe rows used to merge into one group
    # whose sum-of-set-bits was k*n_hashes != n_hashes, reporting a
    # MEMBER as absent (a false negative). Verdicts must be computed
    # per distinct key and every duplicate row must keep its hit.
    members = spark.range(100).selectExpr("CAST(id AS STRING) AS k")
    bits = bloom_bits(members, "k", n_bits=1024, n_hashes=5)
    dup_probes = members.unionAll(members).unionAll(
        spark.createDataFrame([("7",)] * 3, "k string")
    )
    probed = bloom_probe(bits, dup_probes, "k", n_bits=1024, n_hashes=5)
    assert probed.count() == 203  # cardinality preserved
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_count_min_duplicate_probes_keep_cardinality(spark):
    df = spark.createDataFrame([(1,)] * 10 + [(2,)] * 3, "k long")
    cm = count_min_table(df, "k", depth=4, width=32)
    probes = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    out = count_min_estimate(cm, probes, "k", depth=4, width=32).collect()
    assert len(out) == 3
    assert all(r["cm_est"] >= (10 if r["k"] == 1 else 3) for r in out)


def test_bloom_rejects_most_non_members_when_sized(spark):
    members = spark.range(50).selectExpr("CAST(id AS STRING) AS k")
    bits = bloom_bits(members, "k", n_bits=4096, n_hashes=5)
    outsiders = spark.range(1000, 1500).selectExpr("CAST(id AS STRING) AS k")
    fp = bloom_probe(bits, outsiders, "k", n_bits=4096, n_hashes=5).where(
        F.col("bloom_hit")
    )
    # ~250 set bits of 4096 -> fp rate (250/4096)^5 ~ 1e-6
    assert fp.count() <= 2


def test_probes_with_null_keys_get_concrete_verdicts(spark):
    # NULL is a real probe key: its hashes are NULL, no cell/bit can
    # match, so the verdict is a concrete 0 / False — an equi-join
    # back would silently drop it to NULL (regression)
    members = spark.range(50).selectExpr("CAST(id AS STRING) AS k")
    bits = bloom_bits(members, "k", n_bits=1024, n_hashes=5)
    probes = spark.createDataFrame([("1",), (None,)], "k string")
    rows = {r["k"]: r["bloom_hit"] for r in
            bloom_probe(bits, probes, "k", n_bits=1024, n_hashes=5).collect()}
    assert rows["1"] is True
    assert rows[None] is False
    cm = count_min_table(members, "k", depth=4, width=32)
    est = {r["k"]: r["cm_est"] for r in
           count_min_estimate(cm, probes, "k", depth=4, width=32).collect()}
    assert est["1"] >= 1
    assert est[None] == 0
