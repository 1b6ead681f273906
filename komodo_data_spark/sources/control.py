"""Mutable control-plane state on immutable storage.

The reference mutates two control tables in place: ``captures.processed``
(process.py:260-262) and ``data_requests.is_it_fulfilled/file_location``
(process.py:372-376). Parquet is immutable, so each control table is an
append-only *status log*; the current state is a latest-wins view (max
``_status_seq`` per key). On a lakehouse deployment these map 1:1 onto Delta
``UPDATE``s — the API here is the stable seam.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, "_status_log")


def _base_path(table_path: str) -> str:
    return os.path.join(table_path, "base")


def init_table(df: DataFrame, table_path: str) -> None:
    """Write the initial control-table snapshot."""
    df.write.mode("overwrite").parquet(_base_path(table_path))


def append_status(
    spark: SparkSession, table_path: str, key_col: str, updates: list[dict]
) -> None:
    """Append status rows: [{key_col: ..., <col>: <new value>, ...}, ...]."""
    if not updates:
        return
    stamped = [
        {**u, "_status_seq": time.time_ns() + i} for i, u in enumerate(updates)
    ]
    spark.createDataFrame(stamped).write.mode("append").parquet(_log_path(table_path))


def current_view(spark: SparkSession, table_path: str, key_col: str) -> DataFrame:
    """Latest-wins merge of base snapshot + status log."""
    base = spark.read.parquet(_base_path(table_path))
    log_dir = _log_path(table_path)
    try:
        log = spark.read.parquet(log_dir)
    except Exception:
        return base
    w = Window.partitionBy(key_col).orderBy(F.desc("_status_seq"))
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_status_seq")
    )
    update_cols = [c for c in latest.columns if c != key_col]
    joined = base.alias("b").join(latest.alias("u"), key_col, "left")
    merged = [F.col(f"b.{key_col}").alias(key_col)] + [
        (
            F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
            if c in update_cols
            else F.col(f"b.{c}").alias(c)
        )
        for c in base.columns
        if c != key_col
    ]
    return joined.select(*merged)


def mark_processed(
    spark: SparkSession, captures_path: str, results: list[tuple[str, bool, int]]
) -> None:
    """Record ingest outcomes (process.py:251-265): epoch-s on success, 0 on failure."""
    append_status(
        spark,
        captures_path,
        "capture_id",
        [{"capture_id": cid, "processed": stamp} for cid, _ok, stamp in results],
    )


def update_data_request(
    spark: SparkSession,
    requests_path: str,
    request_id: int,
    fulfilled_flag: int,
    file_location: str,
) -> None:
    """Mark one request fulfilled + record the export path (process.py:369-381)."""
    append_status(
        spark,
        requests_path,
        "request_id",
        [
            {
                "request_id": int(request_id),
                "is_it_fulfilled": int(fulfilled_flag),
                "file_location": file_location,
            }
        ],
    )
