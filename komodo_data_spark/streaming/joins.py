"""Streaming deduplication and stream-stream joins over the events stream.

The reference's polling loop (SURVEY §2.10) re-reads whole capture files, so
exactly-once and cross-stream correlation are driver-side concerns there;
Structured Streaming supplies both as engine operators:

- ``dedup_stream``          — drop duplicate event_ids arriving within the
  watermark delay (``dropDuplicatesWithinWatermark``): at-least-once
  sources (file redelivery, Kafka replays) become effectively-once without
  a batch repair job. State holds one key per event_id seen in the last
  watermark window — bounded, unlike plain ``dropDuplicates`` on a stream,
  whose state grows forever.
- ``click_purchase_join``   — stream-stream inner join: each purchase is
  matched to the same user's clicks in the preceding 30 minutes. Both
  sides carry watermarks and the join condition bounds event-time skew, so
  Spark can expire buffered rows; without the time bound the state would
  be unbounded (Spark rejects the plan in append mode).

Both transformations accept a streaming OR batch DataFrame (batch is the
verification twin; the tests pin stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "2 hours"
CLICK_LOOKBACK_MS = 30 * 60 * 1000


def dedup_stream(events: DataFrame) -> DataFrame:
    """Effectively-once event feed keyed by event_id."""
    if events.isStreaming:
        return events.withWatermark("ts_ts", WATERMARK).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def click_purchase_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Purchases joined to the same user's clicks within the prior 30 min.

    Output: (purchase_id, click_id, user_id, gap_ms). The equi-key is
    user_id (one shuffle per side, co-partitioned); the event-time bound is
    a residual predicate that doubles as the state-expiry contract.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts_ts").alias("c_ts"),
        F.col("ts_ms").alias("c_ms"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ts").alias("p_ts"),
        F.col("ts_ms").alias("p_ms"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", WATERMARK)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", WATERMARK)
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.col("p_ms") - F.col("c_ms")).alias("gap_ms"),
    )


def click_purchase_left_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream variant of :func:`click_purchase_join`:
    every click appears; clicks with no purchase in the following 30 min
    emit with NULL purchase columns once the watermark passes their
    interval (the outer-join-needs-watermark contract — Spark rejects the
    query without both watermarks and the time bound, because that's what
    lets it prove when an unmatched row can be finalized).

    Output: (click_id, user_id, purchase_id nullable, gap_ms nullable).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts_ts").alias("c_ts"),
        F.col("ts_ms").alias("c_ms"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ts").alias("p_ts"),
        F.col("ts_ms").alias("p_ms"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", WATERMARK)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", WATERMARK)
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )
    return joined.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "purchase_id",
        (F.col("p_ms") - F.col("c_ms")).alias("gap_ms"),
    )


def run_to_memory_append(
    stream_df: DataFrame, query_name: str, checkpoint: str
) -> DataFrame:
    """Drain an append-mode stream (dedup / stream-stream join) with
    AvailableNow into an in-memory table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def user_segments(events_batch: DataFrame) -> DataFrame:
    """Static dimension for stream enrichment: per-user lifetime stats from
    the batch table (total events, mean value) bucketed into activity
    segments. In production this is the periodically-refreshed profile
    table; here it is derived so the twin test needs no extra fixture."""
    return (
        events_batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .withColumn(
            "segment",
            F.when(F.col("n_events") >= 100, "heavy")
            .when(F.col("n_events") >= 10, "regular")
            .otherwise("light"),
        )
        .select("user_id", "segment")
    )


def enrich_stream(events: DataFrame, segments: DataFrame) -> DataFrame:
    """Stream-static join: tag each event with its user's segment.

    The static side is broadcast (explicit hint) — the canonical
    enrichment plan: no stream-side shuffle, no state store at all (unlike
    a stream-stream join), and the dim is re-resolved per micro-batch so a
    refreshed profile table is picked up automatically. Works identically
    on a batch frame (the verification twin).
    """
    return events.join(F.broadcast(segments), "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
    )
