"""Sessionization over the ``events`` stream table (north-star extension).

Batch gap-and-island formulation: a session breaks when the gap to the
previous event of the same user exceeds SESSION_GAP_MS. The window is
partitioned by ``user_id`` — at 100 TB each user's history sorts locally
within its hash partition, one exchange total, no global sort. (Contrast
with the reference's W1/W2 windows, which are globally ordered because its
queries pre-filter to a single entity stream — SURVEY.md §2.5.)

The streaming twin (streaming/windows.py session_rollup) uses Spark's
``session_window``, whose merge semantics match this gap rule; the test
suite pins stream == batch equality on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from komodo_data_spark.sources.tables import load_events

SESSION_GAP_MS = 30 * 60 * 1000  # 30 minutes


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions: (user_id, session_seq, n_events, start_ms, end_ms,
    duration_ms) with a 30-minute inactivity gap."""
    ev = load_events(spark, sf_dir).select("user_id", "ts_ms")
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    with_breaks = ev.withColumn(
        "is_break",
        (
            F.col("ts_ms") - F.lag("ts_ms", 1).over(w) > SESSION_GAP_MS
        ).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("is_break"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_breaks.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
        )
        .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms"))
    )


def event_sessions_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
    ), b AS (
      SELECT user_id, ts_ms,
        CASE WHEN ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
                  > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS is_break
      FROM e
    ), s AS (
      SELECT user_id, ts_ms,
        CAST(SUM(is_break) OVER (
          PARTITION BY user_id ORDER BY ts_ms
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_seq
      FROM b
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
           max(ts_ms) - min(ts_ms) AS duration_ms
    FROM s GROUP BY user_id, session_seq
    """


def registry():
    """Driver-contract entries: name -> (query fn, oracle SQL)."""
    return {"event_sessions": (event_sessions, event_sessions_oracle())}
