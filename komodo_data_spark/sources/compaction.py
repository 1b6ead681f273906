"""Small-file compaction for the streaming-ingested ``data`` table.

The capture ingest stream (streaming/ingest.py) appends one parquet file per
micro-batch per session partition; after days of 10 s triggers that is
thousands of kilobyte files — the classic small-file problem that destroys
scan throughput at 100 TB (every file costs a footer read + task schedule).

Compaction rewrites each session partition into ⌈bytes / target_bytes⌉
files. Write-audit-publish: the rewrite lands in a sibling staging dir, is
row-counted against the source, and only then swapped in — readers never see
a partial table, and a crashed compaction leaves the original intact.
(Delta/Iceberg OPTIMIZE does this transactionally; this is the plain-parquet
equivalent with the same safety order.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact_data_table(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ``table_path`` (parquet, partitioned by session_id) with
    size-targeted files. Returns the number of output files written."""
    from komodo_data_spark.sources.publish import (
        prepare_staging,
        publish_staged,
    )

    staging = prepare_staging(table_path)  # heal crashes BEFORE reading
    df = spark.read.parquet(table_path)
    n_rows = df.count()
    n_files = max(1, -(-_dir_bytes(table_path) // target_file_bytes))
    (
        df.repartition(n_files, "session_id")
        .write.mode("overwrite")
        .partitionBy("session_id")
        .parquet(staging)
    )
    # audit before publish
    compacted_rows = spark.read.parquet(staging).count()
    if compacted_rows != n_rows:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"compaction row-count mismatch: {compacted_rows} != {n_rows}"
        )
    publish_staged(table_path)
    return sum(
        1
        for root, _d, files in os.walk(table_path)
        for f in files
        if f.endswith(".parquet")
    )
