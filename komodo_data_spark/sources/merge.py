"""Batch MERGE (upsert) into a plain-parquet snapshot table.

The reference mutates state with SQL UPDATEs (control tables,
process.py:171-176's decode rewrite); this engine keeps storage immutable
and derives state (sources/control.py latest-wins views). For the cases
that genuinely need a *merged snapshot* — a document corpus receiving
re-crawled versions, a profile table receiving CDC batches — this module
supplies MERGE semantics as a full-snapshot rewrite:

    merged = updates ⟕ target   (per-key winner = the update)

i.e. an anti-join keeps unmatched target rows, a union adds every update
row (insert or replace), and the result is published write-audit-publish
(staging dir → row-count audit → atomic rename) exactly like compaction.

Scale notes (100 TB): the join is equi-keyed on the merge key — one
shuffle of each side; at real scale you'd partition the target by a stable
key range and rewrite ONLY partitions that receive updates (partition
overwrite), which this API supports by pointing it at one partition
directory. Delta/Iceberg MERGE INTO is the transactional version; the
safety ordering (never mutate in place, audit before publish) is the same.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def merge_snapshot(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
) -> dict:
    """MERGE ``updates`` into the parquet table at ``target_path`` by
    ``key``: matching rows are replaced, new rows inserted. Returns audit
    counts. The rewrite is write-audit-publish via the shared
    crash-recoverable swap (sources/publish.py); a crash leaves the
    original table intact or is healed forward by the next run."""
    from komodo_data_spark.sources.publish import (
        prepare_staging,
        publish_staged,
    )

    staging = prepare_staging(target_path)  # heal crashes BEFORE reading
    target = spark.read.parquet(target_path)
    n_target = target.count()
    n_updates = updates.count()
    kept = target.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates)

    merged.write.mode("overwrite").parquet(staging)

    n_kept = kept.count()
    n_merged = spark.read.parquet(staging).count()
    if n_merged != n_kept + n_updates:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"merge row-count mismatch: {n_merged} != {n_kept} + {n_updates}"
        )
    publish_staged(target_path, keep_backup=True)
    return {
        "target_rows_before": n_target,
        "updates": n_updates,
        "replaced": n_target - n_kept,
        "inserted": n_updates - (n_target - n_kept),
        "rows_after": n_merged,
    }
