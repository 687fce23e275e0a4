"""Hypothesis property tests: CCF vs a pure-Python union-find oracle
on arbitrary small graphs (SURVEY.md §5.2)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_project_spark.graph import (
    connected_components,
    connected_components_star,
)
from map_reduce_project_spark.graph.generators import edges_df

node = st.integers(min_value=0, max_value=30).map(str)
edge = st.tuples(node, node)


def union_find_mapping(edges: list[tuple[str, str]]) -> set[tuple[str, str]]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            # self-loops register the node but connect nothing;
            # CCF never emits for an isolated self-looped node
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    groups: dict[str, set[str]] = {}
    for n in parent:
        groups.setdefault(find(n), set()).add(n)
    expected = set()
    for members in groups.values():
        rep = min(members)  # lexicographic (S1)
        expected |= {(m, rep) for m in members if m != rep}
    return expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(edge, min_size=1, max_size=40))
def test_ccf_matches_union_find(spark, edges):
    expected = union_find_mapping(edges)
    res = connected_components(edges_df(spark, edges))
    got = {(r.node, r.component) for r in res.mapping.collect()}
    assert got == expected
    assert res.converged
    # representative never self-maps (S3)
    assert all(n != c for n, c in got)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(edge, min_size=1, max_size=40))
def test_star_matches_union_find(spark, edges):
    expected = union_find_mapping(edges)
    res = connected_components_star(edges_df(spark, edges))
    got = {(r.node, r.component) for r in res.mapping.collect()}
    assert got == expected
    assert res.converged
