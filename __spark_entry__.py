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
        "events_props_variant": (
            ea.events_props_variant,
            ea.events_props_variant_oracle(),
        ),
        "user_click_purchase_reconcile": (
            ea.user_click_purchase_reconcile,
            ea.user_click_purchase_reconcile_oracle(),
        ),
        "events_user_trend": (ea.events_user_trend, ea.events_user_trend_oracle()),
        "events_value_histogram_equidepth": (
            ea.events_value_histogram_equidepth,
            ea.events_value_histogram_equidepth_oracle(),
        ),
        "events_distinct_sketch_union": (
            ea.events_distinct_sketch_union,
            None,  # sketch estimate: rows-only; exact twin pins semantics in tests
        ),
    }

    try:
        from komodo_data_spark.operators import tpch_extended

        reg.update(tpch_extended.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import window_ops

        reg.update(window_ops.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import reshape

        reg.update(reshape.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import pipeline_ops

        reg.update(pipeline_ops.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import corpus

        reg.update(corpus.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import sessions

        reg.update(sessions.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import dedup

        reg.update(dedup.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import text_analysis

        reg.update(text_analysis.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import similarity

        reg.update(similarity.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import multimodal_ops

        reg.update(multimodal_ops.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import profiling

        reg.update(profiling.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import graph_ops

        reg.update(graph_ops.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import join_strategies

        reg.update(join_strategies.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import stats_ops

        reg.update(stats_ops.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.operators import timeseries

        reg.update(timeseries.registry())
    except ImportError:
        pass
    try:
        from komodo_data_spark.functions import udtfs

        reg["udtf_sentences"] = (udtfs.udtf_sentences, udtfs.udtf_sentences_oracle())
    except ImportError:
        pass
    return reg


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
