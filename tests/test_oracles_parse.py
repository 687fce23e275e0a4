"""Every registered oracle must PLAN in DuckDB: a syntax error or a
misspelled column in an oracle otherwise only surfaces inside the
round driver's correctness gate. EXPLAIN builds the full plan (name
resolution included) without executing."""

from __future__ import annotations

import duckdb
import pytest

from map_reduce_project_spark.queries import all_queries
from map_reduce_project_spark.sources.io import TABLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


def test_every_oracle_plans_in_duckdb(con):
    failures = []
    for name, q in all_queries().items():
        try:
            con.execute(f"EXPLAIN {q.oracle}")
        except Exception as e:  # noqa: BLE001 - collect all failures
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(failures)
