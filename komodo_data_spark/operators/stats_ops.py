"""Frequency / ordered-set statistics operators (north-star extensions).

The reference's aggregate surface is COUNT/SUM/GROUP BY only
(SURVEY.md §2.4); this module adds the frequency-sketch and ordered-set
aggregates an analytics engine is expected to ship:

- ``events_heavy_hitters`` — support-thresholded frequent items via
  Spark 4's ``approx_top_k`` sketch (Space-Saving style: mergeable,
  map-side-combinable, one pass). At the gate scales the distinct-user
  count is far below ``maxItemsTracked`` so the sketch counts are exact
  and the DuckDB HAVING oracle matches bit-for-bit; at 100 TB the same
  plan degrades gracefully to approximate counts in bounded memory
  instead of shuffling the full key space.
- ``orders_stats_pack`` — mode / median / percentile_disc / listagg
  (ordered-set aggregates, SQL:2008 WITHIN GROUP syntax) in ONE
  aggregation pass per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from komodo_data_spark.sources.tables import load_events, load_table

#: Support threshold: users with at least this many events are "heavy".
HEAVY_MIN_EVENTS = 80


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with >= HEAVY_MIN_EVENTS events, found with one approx_top_k
    sketch instead of a full groupBy over the key space.

    The threshold filter (not a raw top-k cut) is what makes the result
    deterministic: rank order among equal counts is sketch-arbitrary, but
    membership of {count >= T} is not. k=1000 bounds the candidate list;
    maxItemsTracked=1M keeps counts exact up to a million distinct users.
    """
    ev = load_events(spark, sf_dir)
    sketch = ev.agg(
        F.expr("approx_top_k(user_id, 1000, 1000000)").alias("tk")
    )
    return (
        sketch.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("user_id"),
            F.col("e.count").alias("n_events"),
        )
        .filter(F.col("n_events") >= HEAVY_MIN_EVENTS)
    )


def events_heavy_hitters_oracle() -> str:
    return f"""
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id HAVING count(*) >= {HEAVY_MIN_EVENTS}
    """


def events_heavy_hitters_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same heavy-hitter result through the MERGEABLE sketch lifecycle:
    approx_top_k_accumulate per day -> approx_top_k_combine across days ->
    approx_top_k_estimate — the incremental pattern where each day's sketch
    is persisted bytes and today's scan never re-reads history (the
    frequency-sketch sibling of events_distinct_sketch_union).

    The daily pre-aggregate stands in for the stored sketch table. Counts
    stay exact while distinct keys per sketch fit maxItemsTracked, so the
    same HAVING oracle pins the merge path end-to-end at gate scale.
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.expr("ts_ms div 86400000").alias("day")).agg(
        F.expr("approx_top_k_accumulate(user_id, 100000)").alias("sk")
    )
    # approx_top_k_combine over ZERO rows crashes (scala.MatchError: null)
    # rather than returning an empty sketch, so an empty events table would
    # kill the query. Union in a seed: accumulate over zero rows DOES yield
    # a valid empty sketch, making the combine input provably non-empty and
    # the empty-input result an empty frame, as it should be.
    seed = ev.limit(0).agg(
        F.expr("approx_top_k_accumulate(user_id, 100000)").alias("sk")
    )
    merged = daily.select("sk").unionByName(seed).agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(sk, 1000000), 1000)").alias(
            "tk"
        )
    )
    return (
        merged.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("user_id"),
            F.col("e.count").alias("n_events"),
        )
        .filter(F.col("n_events") >= HEAVY_MIN_EVENTS)
    )


def orders_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order statistics: modal status (deterministic lowest-on-
    tie via WITHIN GROUP ASC), exact median and 25th discrete percentile of
    the total price, and the distinct status roster as an ordered listagg.

    All five aggregates evaluate in one hash-aggregate pass on
    ``o_orderpriority`` (median/percentile_disc buffer per-group values —
    fine for bounded group counts like the 5 priorities; for high-cardinality
    groups switch to approx_percentile, cf. corpus.event_value_percentiles).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("mode() WITHIN GROUP (ORDER BY o_orderstatus)").alias("mode_status"),
        F.median("o_totalprice").alias("median_price"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p25_price"
        ),
        F.expr(
            "listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)"
        ).alias("statuses"),
    )


def orders_stats_pack_oracle() -> str:
    # DuckDB mode() tie-break is unspecified -> derive the deterministic
    # lowest-value mode from a windowed count instead.
    return """
    WITH status_counts AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS c
      FROM orders GROUP BY 1, 2
    ), modal AS (
      SELECT o_orderpriority, o_orderstatus AS mode_status
      FROM status_counts
      QUALIFY row_number() OVER (
        PARTITION BY o_orderpriority ORDER BY c DESC, o_orderstatus ASC
      ) = 1
    ), stats AS (
      SELECT o_orderpriority,
             count(*) AS n_orders,
             median(o_totalprice) AS median_price,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
               AS p25_price,
             string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses
      FROM orders GROUP BY 1
    )
    SELECT s.o_orderpriority, s.n_orders, m.mode_status, s.median_price,
           s.p25_price, s.statuses
    FROM stats s JOIN modal m USING (o_orderpriority)
    """


def registry():
    """Driver-contract entries: name -> (query fn, oracle SQL)."""
    return {
        "events_heavy_hitters": (events_heavy_hitters, events_heavy_hitters_oracle()),
        "events_heavy_hitters_merged": (
            events_heavy_hitters_merged,
            events_heavy_hitters_oracle(),  # same result through the merge path
        ),
        "orders_stats_pack": (orders_stats_pack, orders_stats_pack_oracle()),
    }
