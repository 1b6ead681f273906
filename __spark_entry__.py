"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) on
sf0.001. ``queries()`` registers every implemented operator from
SURVEY.md §2 (+ extension pack); ``oracle_sql()`` pairs each with the
DuckDB-runnable ANSI SQL the driver compares against at sf0.01.

Column names are aliased identically on both sides — the driver sorts
columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from komodo_data_spark.operators import relational

    return relational.q1_pricing_summary(spark, SF0001)


def _registry() -> dict[str, tuple[QueryFn, str | None]]:
    """name -> (query callable, oracle SQL or None for rows-only checks)."""
    from komodo_data_spark.operators import events_analytics as ea
    from komodo_data_spark.operators import relational as rel

    reg: dict[str, tuple[QueryFn, str | None]] = {
        # --- relational pack (joins / aggs / windows / set ops) ---
        "q1_pricing_summary": (rel.q1_pricing_summary, rel.q1_oracle()),
        "q3_shipping_priority": (rel.q3_shipping_priority, rel.q3_oracle()),
        "q5_local_supplier_volume": (rel.q5_local_supplier_volume, rel.q5_oracle()),
        "q6_forecast_revenue": (rel.q6_forecast_revenue, rel.q6_oracle()),
        "q10_returned_items": (rel.q10_returned_items, rel.q10_oracle()),
        "top_customers_per_nation": (
            rel.top_customers_per_nation,
            rel.top_customers_oracle(),
        ),
        "revenue_rollup": (rel.revenue_rollup, rel.revenue_rollup_oracle()),
        "customers_with_orders": (
            rel.customers_with_orders,
            rel.customers_with_orders_oracle(),
        ),
        "customers_without_orders": (
            rel.customers_without_orders,
            rel.customers_without_orders_oracle(),
        ),
        "asof_last_click_before_purchase": (
            rel.asof_last_click_before_purchase,
            rel.asof_oracle(),
        ),
        "asof_nearest_click": (rel.asof_nearest_click, rel.asof_nearest_oracle()),
        "asof_cogroup": (rel.asof_cogroup, rel.asof_oracle()),
        "events_hourly_rollup": (rel.events_hourly_rollup, rel.events_hourly_oracle()),
        "customer_year_setops": (
            rel.customer_year_setops,
            rel.customer_year_setops_oracle(),
        ),
        "customers_every_year": (
            rel.customers_every_year,
            rel.customers_every_year_oracle(),
        ),
        "orders_status_cube": (
            rel.orders_status_cube,
            rel.orders_status_cube_oracle(),
        ),
        "supplier_part_distinct_exact": (
            rel.supplier_part_distinct_exact,
            rel.supplier_part_distinct_exact_oracle(),
        ),
        "supplier_part_distinct_approx": (
            rel.supplier_part_distinct_approx,
            None,  # HLL sketch: rows-only check, exact twin pins semantics
        ),
        "lineitem_price_tiers": (
            rel.lineitem_price_tiers,
            rel.lineitem_price_tiers_oracle(),
        ),
        "lineitem_price_tiers_bucketed": (
            rel.lineitem_price_tiers_bucketed,
            rel.lineitem_price_tiers_oracle(),  # same semantics, equi-join plan
        ),
        "events_distinct_users_two_stage": (
            rel.events_distinct_users_two_stage,
            rel.events_distinct_users_two_stage_oracle(),
        ),
        "nation_revenue_share": (
            rel.nation_revenue_share,
            rel.nation_revenue_share_oracle(),
        ),
        # --- reference analytics re-targeted at the events table ---
        "interaction_counts": (ea.interaction_counts, ea.interaction_counts_oracle()),
        "user_activity": (ea.user_activity, ea.user_activity_oracle()),
        "user_energy_events": (ea.user_energy_events, ea.user_energy_events_oracle()),
        "user_copresence": (ea.user_copresence, ea.user_copresence_oracle()),
        "copresence_pairs": (ea.copresence_pairs, ea.copresence_pairs_oracle()),
        "event_pattern": (ea.event_pattern, ea.event_pattern_oracle()),
        "user_state_history": (
            ea.user_state_history,
            ea.user_state_history_oracle(),
        ),
        "funnel_conversion": (ea.funnel_conversion, ea.funnel_conversion_oracle()),
        "retention_cohorts": (ea.retention_cohorts, ea.retention_cohorts_oracle()),
        "events_value_histogram": (
            ea.events_value_histogram,
            ea.events_value_histogram_oracle(),
        ),
        "events_value_anomalies": (
            ea.events_value_anomalies,
            ea.events_value_anomalies_oracle(),
        ),
        "events_seasonal_anomalies": (
            ea.events_seasonal_anomalies,
            ea.events_seasonal_anomalies_oracle(),
        ),
        "events_props_variant": (
            ea.events_props_variant,
            ea.events_props_variant_oracle(),
        ),
        "user_click_purchase_reconcile": (
            ea.user_click_purchase_reconcile,
            ea.user_click_purchase_reconcile_oracle(),
        ),
        "events_user_trend": (ea.events_user_trend, ea.events_user_trend_oracle()),
        "events_transition_matrix": (
            ea.events_transition_matrix,
            ea.events_transition_matrix_oracle(),
        ),
        "events_interarrival_stats": (
            ea.events_interarrival_stats,
            ea.events_interarrival_stats_oracle(),
        ),
        "events_type_correlations": (
            ea.events_type_correlations,
            ea.events_type_correlations_oracle(),
        ),
        "events_value_histogram_equidepth": (
            ea.events_value_histogram_equidepth,
            ea.events_value_histogram_equidepth_oracle(),
        ),
        "events_value_psi_drift": (
            ea.events_value_psi_drift,
            ea.events_value_psi_drift_oracle(),
        ),
        "events_distinct_sketch_union": (
            ea.events_distinct_sketch_union,
            None,  # sketch estimate: rows-only; exact twin pins semantics in tests
        ),
        "events_disorder_stats": (
            ea.events_disorder_stats,
            ea.events_disorder_stats_oracle(),
        ),
        "events_audience_overlap": (
            ea.events_audience_overlap,
            ea.events_audience_overlap_oracle(),
        ),
    }

    # Import failures must raise, not shrink the registry: a silently-dropped
    # pack would make the correctness gate report fewer queries while staying
    # green. scripts/check.py asserts EXPECTED_REGISTRY_COUNT as a backstop.
    from komodo_data_spark.functions import udtfs
    from komodo_data_spark.operators import (
        corpus,
        dedup,
        graph_ops,
        join_strategies,
        multimodal_ops,
        pipeline_ops,
        profiling,
        reshape,
        retrieval,
        sessions,
        similarity,
        stats_ops,
        text_analysis,
        timeseries,
        tpch_extended,
        window_ops,
    )

    for pack in (
        tpch_extended, window_ops, reshape, pipeline_ops, corpus, sessions,
        dedup, text_analysis, similarity, retrieval, multimodal_ops,
        profiling, graph_ops, join_strategies, stats_ops, timeseries,
    ):
        reg.update(pack.registry())
    reg["udtf_sentences"] = (udtfs.udtf_sentences, udtfs.udtf_sentences_oracle())

    ordered: dict[str, tuple[QueryFn, str | None]] = {}
    for name in _PRIORITY:
        ordered[name] = reg[name]
    for name, entry in reg.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered


# The driver records correctness rows for the FIRST 50 registry entries in
# registration order. The r13 window (round-12 verdict ask #2): (a) every
# query that has NEVER had a driver row (this round's three approx twins +
# the four r12 additions the r12 window missed), (b) the round-12
# second-half queries whose implementations changed after the r12 window
# froze (driver-unwitnessed since), (c) every query this round's
# optimizations touched, (d) stalest-witness fill. Queries outside the
# window keep their oracle pairing and are verified by the judge's full
# scripts/check.py re-run.
_PRIORITY: tuple[str, ...] = (
    # --- (a) never driver-witnessed ---
    "docs_quality_quantile_filter_approx",  # NEW r13 (rows-only sketch twin)
    "docs_perplexity_buckets_approx",  # NEW r13 (rows-only sketch twin)
    "events_mad_outliers_approx",  # NEW r13 (rows-only sketch twin)
    "dedup_embedding_recall_sampled",
    "knn_lsh_recall_sampled",
    "kmeans_clusters_published",
    "dedup_semantic_published",
    # --- (b) r12 second-half changes the r12 window missed ---
    "dedup_simhash",
    "dedup_simhash_recall",  # also r13: slice width
    "media_simhash_pairs",
    "media_simhash_pairs_capped",
    "media_simhash_capped_recall",
    "media_simhash_recall",  # also r13: slice width
    "text_bpe_train_apply",
    "text_bpe_merges",
    "text_bpe_merges_batched",
    "text_bpe_batched_train_apply",
    "text_bpe_published_apply",
    "text_bpe_encode",
    "text_bpe_packed_sequences",
    "text_nb_quality_classifier",
    "text_nb_calibration",
    "session_overlap_pairs",
    "text_kneser_ney3_apply",
    # --- (c) changed in round 13 ---
    "text_kneser_ney3_logprob",  # one-pass model counts
    "docs_quality_quantile_filter",  # shared scored frame
    "docs_quality_band_filter",  # shared scored frame
    "docs_quality_token_weighted_filter",  # shared scored frame
    "kmeans_clusters",  # map-side Lloyd argmin
    "dedup_semantic",  # map-side Lloyd argmin
    "knn_pq_adc",  # map-side PQ argmin
    "knn_pq_recall",
    "knn_pq_published_adc",  # fused map-side encode+reconstruct
    "knn_ivfpq_adc",
    "knn_ivfpq_recall",
    "dedup_minhash_recall_sampled",  # eval-slice width
    "dedup_minhash_oph_recall",  # eval-slice width
    "graph_components",  # star-CC round machinery
    "dedup_clusters_star",  # star-CC round machinery
    "dedup_fuzzy_prefix",  # PassJoin structs as parsed SQL
    "dedup_fuzzy_prefix_capped",
    "dedup_fuzzy_capped_recall",
    "customers_fuzzy_name_pairs",
    "docs_perplexity_buckets",  # exact anchor of the new approx twin
    "events_mad_outliers",  # exact anchor of the new approx twin
    # --- (d) stalest driver witnesses (last seen r04) ---
    "knn_quantized_recall",
    "media_decoded_features",
    "media_frame_dedup",
    "media_metadata",
    "media_metadata_arrow",
)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
