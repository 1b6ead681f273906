"""Capture-file ingestion: the reference's ingest loop, Spark-first.

Reference flow (/root/reference/process.py:450-473): poll `captures` for rows
with ``end IS NOT NULL AND processed IS NULL`` ordered by ``start``
(process.py:40-45), derive the file path ``{CAPTURES_DIR}/{session}/{capture}/
data`` from the capture_id (process.py:460-462), load the JSON file
(process.py:233-249), append to the `data` table, and mark the capture row
processed = epoch-seconds on success / 0 on failure (process.py:251-265).

Rebuild decisions:
- The `data` table is Parquet **partitioned by session_id**: every reference
  query filters ``session_id = :x`` (process.py:83,149,207), so partition
  pruning turns full-table rescans into single-partition reads. At 100 TB,
  add a date partition derived from `ts` as the second key.
- Control state (`captures.processed`) lives in an append-only status log
  with a latest-wins view (control.py) — immutable storage, no in-place
  UPDATE needed.
- The capture JSON file is an array of records (what pandas.read_json
  consumed) → ``multiLine=True``; JSON-lines files also work (auto-detected
  by extension of the first character is unnecessary — we try records mode
  first and fall back).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from komodo_data_spark.schemas import CAPTURE_FILE_SCHEMA

CAPTURE_FILE_NAME = "data"  # reference: process.py:16


def capture_path(captures_dir: str, capture_id: str) -> str:
    """``{CAPTURES_DIR}/{session}/{capture}/data`` (process.py:460-462)."""
    session, capture = capture_id.split("_", 1)
    return os.path.join(captures_dir, session, capture, CAPTURE_FILE_NAME)


def read_capture_file(spark: SparkSession, path: str) -> DataFrame:
    """Read one capture JSON file with the explicit schema.

    `capture_id` survives as a string by schema fiat (the reference needed a
    dtype override because pandas would parse ``126_163…`` as an underscored
    int literal; process.py:239-240 — schema-first reading makes the issue
    structurally impossible). The `message` field is kept as raw JSON text.
    """
    # Detect the format structurally: a records-array file starts with '[',
    # anything else is JSON-lines. (A take(1) null-probe is NOT safe the other
    # way round: multiLine=true on a JSONL file parses only the FIRST record —
    # which has a perfectly valid capture_id — and silently drops the rest.)
    with open(path, "rb") as f:
        head = f.read(4096).lstrip()
    multiline = head.startswith(b"[")
    # FAILFAST: malformed JSON must RAISE (and surface as the caller's
    # ok=False), mirroring the reference's pd.read_json behavior. The
    # default PERMISSIVE mode would quietly materialize corrupt records as
    # all-null rows and report a successful ingest of garbage.
    reader = spark.read.schema(CAPTURE_FILE_SCHEMA).option("mode", "FAILFAST")
    if multiline:
        return reader.option("multiLine", "true").json(path)
    return reader.json(path)


def append_to_data_table(df: DataFrame, data_table_path: str) -> None:
    """Append ingested rows to the `data` table (process.py:243's to_sql).

    Partitioned by session_id for partition pruning under the reference's
    ubiquitous ``session_id = :x`` filters.
    """
    df.write.mode("append").partitionBy("session_id").parquet(data_table_path)


def process_file(
    spark: SparkSession, capture_id: str, file: str, data_table_path: str
) -> bool:
    """Ingest one capture file; bool contract as the reference (process.py:233-249)."""
    try:
        if not os.path.isfile(file):
            print(f"Error processing file: {file}: file does not exist")
            return False
        df = read_capture_file(spark, file)
        append_to_data_table(df, data_table_path)
        return True
    except Exception as e:  # failure isolation: pipeline continues (process.py:247-249)
        print(f"Error processing file: {file}: {e}")
        return False


def ingest_ready_captures(
    spark: SparkSession,
    captures: DataFrame,
    captures_dir: str,
    data_table_path: str,
) -> list[tuple[str, bool, int]]:
    """One poll iteration: ingest every ready capture in `start` order.

    Returns [(capture_id, success, processed_stamp)] — processed_stamp is
    epoch-seconds on success, 0 on failure (process.py:255-258). The caller
    records the stamps via control.mark_processed.
    """
    ready = [
        r["capture_id"]
        for r in (
            captures.filter(F.col("end").isNotNull() & F.col("processed").isNull())
            .orderBy("start")
            .select("capture_id")
            .collect()  # control-plane rows: tiny by construction
        )
    ]
    results: list[tuple[str, bool, int]] = []
    for cid in ready:
        ok = process_file(spark, cid, capture_path(captures_dir, cid), data_table_path)
        results.append((cid, ok, int(time.time()) if ok else 0))
    return results
