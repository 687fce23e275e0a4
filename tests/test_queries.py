"""Registry-query cross-checks beyond the DuckDB oracle gate."""

from __future__ import annotations


def test_stats_suite_matches_numpy(spark):
    """The exact-moment corr/stddev must agree with numpy's float
    implementation to ~1e-9 relative (different summation order)."""
    import numpy as np

    from map_reduce_project_spark.queries import all_queries

    rows = all_queries()["q36_stats_suite"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(-1.0 <= r.corr <= 1.0 for r in rows)
    from map_reduce_project_spark.sources.io import read_table

    c = read_table(spark, "/root/testdata/sf0.001", "customer").toPandas()
    o = read_table(spark, "/root/testdata/sf0.001", "orders").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for r in rows:
        g = j[j.c_mktsegment == r.seg]
        x = np.round(g.c_acctbal * 100).astype("int64")
        y = np.round(g.o_totalprice * 100).astype("int64")
        assert abs(r.corr - np.corrcoef(x, y)[0, 1]) < 1e-9
        assert abs(r.covar_samp - np.cov(x, y, ddof=1)[0, 1]) < 1e-6 * abs(r.covar_samp)
