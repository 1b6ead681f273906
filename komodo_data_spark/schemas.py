"""Explicit schemas for the reference data model.

The reference lets pandas infer the fact-table schema at ingest with two
overrides (capture_id → string, message → JSON; /root/reference/process.py:239-243).
Schema inference over 100 TB is a non-starter, so the rebuild pins explicit
StructTypes; column set and types are evidenced by the reference's query usage
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# `data` — the event/telemetry fact table (reference: process.py:82,148,206,393,426).
# `ts` stays a raw epoch-millis LongType: the energy metric divides by raw
# millis deltas (process.py:204), so converting to TimestampType would only
# add casts back. `message` stays a JSON string; hot paths may parse it once
# with from_json (see functions.json_compat.MESSAGE_STRUCT).
DATA_SCHEMA = StructType(
    [
        StructField("capture_id", StringType()),  # "{session}_{epochMillis}" (process.py:460-461)
        StructField("session_id", IntegerType()),
        StructField("client_id", IntegerType()),
        StructField("type", StringType()),  # 'sync' | 'interaction' | 'draw'
        StructField("ts", LongType()),  # epoch millis
        StructField("seq", LongType()),  # per-capture message counter
        StructField("message", StringType()),  # JSON document
    ]
)

# Raw capture file records: DATA_SCHEMA minus nothing — the file carries the
# same columns (the MySQL auto-id is storage-side; we derive order from seq).
CAPTURE_FILE_SCHEMA = DATA_SCHEMA

# `captures` — control table (process.py:41-44, :255-262; test_data/test_sql.sql:3).
CAPTURES_SCHEMA = StructType(
    [
        StructField("capture_id", StringType()),
        StructField("session_id", IntegerType()),
        StructField("start", LongType()),  # epoch millis
        StructField("end", LongType(), nullable=True),  # NULL = still recording
        StructField("processed", LongType(), nullable=True),  # NULL pending / epoch-s done / 0 failed
    ]
)

# `data_requests` — aggregation work queue (DDL at process.py:283-295).
DATA_REQUESTS_SCHEMA = StructType(
    [
        StructField("request_id", IntegerType()),
        StructField("processed_capture_id", StringType()),
        StructField("who_requested", IntegerType()),
        StructField("aggregation_function", StringType()),
        StructField("is_it_fulfilled", IntegerType()),
        StructField("url", StringType(), nullable=True),
        StructField("message", StringType(), nullable=True),  # JSON request params
        StructField("file_location", StringType(), nullable=True),
    ]
)
