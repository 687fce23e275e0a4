"""Shared test fixtures: one tuned local SparkSession per test session."""

from __future__ import annotations

import pytest

from map_reduce_project_spark import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Small local session: 4 threads, 4 shuffle partitions — unit tests
    # verify semantics, not scale. bench.py exercises the scale config.
    session = get_spark(
        "map-reduce-project-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield session


@pytest.fixture(scope="session")
def sf0001():
    return SF0001


@pytest.fixture(scope="session")
def sf001():
    return SF001
