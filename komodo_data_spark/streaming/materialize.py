"""Continuously-maintained materialized rollup via ``foreachBatch``.

The streaming twin of "CREATE MATERIALIZED VIEW": the hourly rollup
(streaming/windows.py) runs in update mode, and each micro-batch's changed
(window, event_type) rows are upserted into a keyed parquet store. Readers
always see a complete, deduplicated rollup table without replaying the
stream.

Upsert here is read-antijoin-union-overwrite on plain parquet — correct but
O(table) per batch; on a lakehouse table format (Delta/Iceberg) the same
``foreachBatch`` body becomes a keyed MERGE touching only changed files.
The pattern (update-mode agg + idempotent keyed sink) is the load-bearing
part: at 100 TB only the hot windows churn, so the changed-row volume per
batch is tiny regardless of table size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

KEY_COLS = ["window_start_ms", "event_type"]


def upsert_rollup(spark: SparkSession, batch_df: DataFrame, rollup_path: str) -> None:
    """Idempotent keyed upsert of one micro-batch into the rollup store."""
    # eager localCheckpoint, not cache(): consumed by the antijoin keys and
    # the union in the same batch, then GC-released at function exit — a
    # cache() entry per micro-batch accumulates for the life of the stream
    changed = batch_df.dropDuplicates(KEY_COLS).localCheckpoint(eager=True)
    if os.path.exists(rollup_path):
        existing = spark.read.parquet(rollup_path)
        kept = existing.join(changed.select(KEY_COLS), KEY_COLS, "left_anti")
        merged = kept.unionByName(changed)
    else:
        merged = changed
    staging = rollup_path.rstrip("/") + ".__staging__"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(rollup_path):
        import shutil

        shutil.rmtree(rollup_path)
    os.rename(staging, rollup_path)


def start_rollup_maintenance(
    spark: SparkSession,
    rollup_stream: DataFrame,
    rollup_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``rollup_path`` from an update-mode streaming aggregation
    (e.g. streaming.windows.hourly_rollup of an events stream)."""
    writer = (
        rollup_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch_df, _epoch: upsert_rollup(spark, batch_df, rollup_path)
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
