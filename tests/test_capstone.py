"""End-to-end curation capstone tests (queries/capstone.py).

The driver gate hash-checks the capstone against its DuckDB replay;
these tests pin the cheaper structural invariants per commit — pack
contiguity, funnel monotonicity, and the duplicate_spans totality
regression the capstone composition exposed (Catalyst's inferred
generate-filter replaying the gram-hash expression below the
size >= k guard on <k-token rows)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from map_reduce_project_spark.queries.capstone import (
    CONTEXT_LEN,
    curation_capstone_funnel_q,
    curation_capstone_q,
)


def test_capstone_manifest_invariants(spark, sf0001):
    rows = sorted(
        curation_capstone_q(spark, sf0001).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows, "capstone produced no surviving documents"
    offset = 0
    for r in rows:
        # packing is a contiguous prefix sum in doc_id order
        assert r.start_offset == offset
        assert r.bin_id == offset // CONTEXT_LEN
        assert r.offset_in_bin == offset % CONTEXT_LEN
        offset += r.n_pieces
        # excision accounting
        assert 0 <= r.n_tokens_cut <= r.n_tokens_before
        assert r.n_pieces >= 1


def test_capstone_funnel_monotone(spark, sf0001):
    f = curation_capstone_funnel_q(spark, sf0001).collect()[0]
    # every stage only drops documents
    assert f.n_raw >= f.n_extracted >= f.n_quality >= f.n_canonical > 0
    # the HTML wrap omits content for doc_id % 17 == 3, so extraction
    # attrition is non-zero by construction
    assert f.n_extracted < f.n_raw
    assert f.n_docs_excised <= f.n_canonical
    assert 0 <= f.tokens_cut <= f.tokens_before
    # each surviving word encodes to >= 1 piece
    assert f.total_pieces >= f.tokens_before - f.tokens_cut
    assert f.n_bins == math.ceil(f.total_pieces / CONTEXT_LEN)


def test_duplicate_spans_total_on_short_rows(spark):
    """Regression: duplicate_spans on a plan whose unfiltered input
    holds <k-token rows (the capstone's extraction stage emits ''
    texts). Pre-fix, InferFiltersFromGenerate re-inlined the
    gram-hash transform below the size >= k guard and
    sequence(1, size-k+1) descended through slice(_, 0, k) — a
    runtime crash. The expression is now total and the explode
    inference-exempt."""
    from map_reduce_project_spark.operators.dedup import duplicate_spans

    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 == 0, F.lit(""))
        .when(F.col("id") % 5 == 1, F.lit("a b c"))
        .otherwise(
            F.concat(
                F.lit("x y z w x y z w stable tail "),
                (F.col("id") % 3).cast("string"),
            )
        )
        .alias("text"),
    )
    keep = docs.where(F.length("text") > 4).select("doc_id")
    filtered = docs.join(keep, "doc_id", "left_semi")
    spans = duplicate_spans(filtered, k=4).collect()
    assert spans  # the shared 8-token prefix duplicates across docs
    for s in spans:
        assert s.span_start >= 1
        assert s.span_end >= s.span_start
