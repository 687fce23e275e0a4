"""Scale-sizing rules for dedup/ANN fan-out parameters (pure Python —
no Spark session needed)."""

from __future__ import annotations

from map_reduce_project_spark.operators.dedup import (
    DEFAULT_NUM_HASHES,
    minhash_sizing,
)
from map_reduce_project_spark.operators.similarity import (
    ivf_sizing,
    lsh_planes_sizing,
)


def test_minhash_sizing_scales_up():
    n, b = minhash_sizing(10_000_000, threshold=0.8)
    assert n == 64
    assert n % b == 0
    midpoint = (1.0 / b) ** (b / n)
    assert abs(midpoint - 0.8) < 0.1


def test_minhash_sizing_demo_corpus_keeps_gate_defaults():
    n, b = minhash_sizing(1_000)
    assert n == DEFAULT_NUM_HASHES
    assert n % b == 0


def test_minhash_sizing_threshold_monotonic():
    # lower threshold -> more bands (more recall)
    _, b_low = minhash_sizing(10_000_000, threshold=0.5)
    _, b_high = minhash_sizing(10_000_000, threshold=0.9)
    assert b_low >= b_high


def test_ivf_sizing_sqrt_rule():
    nc, np_ = ivf_sizing(1_000_000)
    assert nc == 1000
    assert np_ == 62
    nc_small, np_small = ivf_sizing(100)
    assert nc_small == 16 and np_small == 1


def test_lsh_planes_sizing():
    assert lsh_planes_sizing(1_048_576, target_bucket_size=1024) == 10
    assert lsh_planes_sizing(10**9, target_bucket_size=1024) == 20
    assert lsh_planes_sizing(500) >= 1


def test_probe_fraction_floors_expected_hub_hits():
    from map_reduce_project_spark.graph.ccf import (
        _PROBE_MIN_EXPECTED_HITS,
        SKEW_DEGREE_THRESHOLD,
        _probe_fraction,
    )

    # small graphs: exact (fraction 1.0)
    assert _probe_fraction(1_000_000, SKEW_DEGREE_THRESHOLD) == 1.0
    # at ANY scale a threshold-degree hub expects >= the configured
    # hit floor in the sample — the fraction may not decay below it
    for n_edges in (10**8, 10**10, 10**12, 10**14):
        frac = _probe_fraction(n_edges, SKEW_DEGREE_THRESHOLD)
        assert frac * SKEW_DEGREE_THRESHOLD >= _PROBE_MIN_EXPECTED_HITS
