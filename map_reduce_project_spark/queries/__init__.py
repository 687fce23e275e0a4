"""Query registry: every operator exposed by the engine, wired to the
driver's star-schema tables, each with its DuckDB oracle SQL twin.

A ``Query`` couples the Spark implementation and the ANSI-SQL oracle in
one place so column aliases can never drift apart (the driver's
correctness gate hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    description: str = ""


def all_queries() -> dict[str, Query]:
    from map_reduce_project_spark.queries import (
        advanced,
        dedup,
        events,
        graph_queries,
        multimodal,
        pipeline,
        relational,
        similarity,
        temporal,
        text,
    )

    by_name: dict[str, Query] = {}
    for mod in (
        relational,
        graph_queries,
        dedup,
        similarity,
        text,
        events,
        multimodal,
        advanced,
        temporal,
        pipeline,
    ):
        for q in mod.QUERIES:
            if q.name in by_name:
                raise ValueError(f"duplicate query name: {q.name}")
            by_name[q.name] = q

    # The driver's correctness gate checks the FIRST 50 registry
    # entries per round. Order queries so the ones with the least
    # accumulated driver evidence come first. Round-3 rotation: the 24
    # queries that overflowed the window in rounds 1-2 (green in the
    # local driver-identical gate, tools/oracle_check.py, but never in
    # a CORRECTNESS_r0N.json), then every query whose implementation
    # was touched this round (changed-this-round => in-window policy),
    # then new round-3 queries, then the proven remainder.
    priority = [
        # never driver-checked (overflowed the r1/r2 windows)
        "ev_path_ngrams",
        "kcore_part_supplier",
        "text_vocab",
        "emb_quantize_int8",
        "dedup_simhash_pairs",
        "dedup_cluster_canonical",
        "decontaminate_train",
        "lpa_communities",
        "dedup_incremental",
        "dedup_winnow_pairs",
        "text_repetition",
        "text_pack_manifest",
        "ev_retention_cohorts",
        "ann_arrow_topk",
        "sssp_part_supplier",
        "cc_clustering_coeff",
        "cc_degree_profile",
        "rag_retrieve_topk",
        "text_pii_scrub",
        "text_unigram_scores",
        "text_bow_cosine",
        "ev_enriched_streaming",
        # changed this round: graph intake canonicalized via
        # canonical_undirected (analytics.py) — re-verify consumers
        "bfs_part_supplier",
        "pagerank_part_supplier",
        "cc_triangles",
        # new in round 3: real pixel decode/resize; q23 exact-twin
        # oracle (was the one no_oracle row)
        "mm_pixel_stats",
        "mm_resize_pixels",
        "q23_approx_distinct",
        "q44_zorder_code",
        "q45_variant",
        "q46_heavy_hitters",
        "q47_approx_percentile",
        "pysource_telemetry",
        # new in round 3 (second batch): semantic dedup + embedding
        # compression operators
        "dedup_semantic",
        "emb_srp_project",
        "emb_pq_codes",
        "q48_merge_upsert",
        "q49_scd2_history",
        "dedup_normalized",
        "text_quality_classifier",
        "ev_interpolate",
        "rag_hybrid_rrf",
        "cc_assortativity",
        "cc_link_prediction",
        "ev_asof_cogroup",
        "emb_kmeans_int",
        "emb_hard_negatives",
        "mm_audio_stats",
        "dedup_recall_report",
        "q50_window_count_distinct",
        # ev_gap_fill / ev_anomaly_zscore ceded their round-3 window
        # slots to the zero-driver-evidence queries above: both were
        # independently oracle-verified by the round-2 review's own
        # gate run, the strongest evidence tier below a driver row.
        # Front of the queue for round 4.
        "ev_gap_fill",
        "ev_anomaly_zscore",
        # late round-3 additions (positions 53+, outside this round's
        # 50-query window; verified by the local driver-identical gate
        # — rotate them into the round-4 window)
        "asof_forward",
        "dedup_containment",
        "text_bigram_lm",
        "q51_hll_sketch",
        "emb_binary_codes",
        "ev_rfm_scores",
        "emb_truncation_recall",
        "ppr_part_supplier",
        "ev_markov_transitions",
        "text_keywords_tfidf",
        "sample_balanced",
        "range_session_blast",
        "mm_image_dhash",
        "ann_pq_adc",
        "text_lang_confusion",
        "q52_scd2_incremental",
        "q53_null_safe_join",
        "ev_session_conversion",
        "dedup_prefix_filter",
        "mm_shot_boundaries",
        "q54_value_functions",
        "q55_rolling_7d_revenue",
        "ev_cohort_ltv",
        "emb_kmeans_centroids",
        "q56_grouping_id",
        "ev_bot_detection",
        "mm_audio_activity",
        "q57_set_ops_all",
        "ev_dau_wau_mau",
        "ann_ivf_pq",
        "ev_activity_streaks",
        "ev_error_budget",
        "q58_supplier_hhi",
        "q59_revenue_gini",
        "sample_kfold",
        "q60_share_of_total",
        "emb_ivf_recall",
        "ushape_attribution",
        "timedecay_attribution",
        "asof_convert_time",
        "q61_agg_surface",
        "dedup_savings_report",
        "q62_fuzzy_match",
        "text_hapax_ratio",
        "ev_anomaly_mad",
        "q63_latest_snapshot",
        "text_zipf_profile",
        "mm_pixel_histogram",
        "text_regexp_suite",
        "ev_seasonality",
    ]
    # environment-gated queries (registered only where their runtime
    # deps exist — e.g. ev_sessions_tws needs protobuf) float to the
    # front when present
    priority = [n for n in priority if n in by_name] + [
        n
        for n in ("ev_sessions_tws",)
        if n in by_name
    ]
    registry: dict[str, Query] = {n: by_name[n] for n in priority}
    for name, q in by_name.items():
        if name not in registry:
            registry[name] = q
    return registry


__all__ = ["Query", "all_queries"]
