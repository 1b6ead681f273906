"""Streaming variant of the capture ingest loop.

The reference polls every 10 s in a while-True loop (process.py:455-469) and
tracks progress via the ``captures.processed`` flag. Structured Streaming's
file source replaces both: new capture files are discovered incrementally and
the checkpoint gives exactly-once per file — the `captures` status updates
remain only for API parity (sources.control).

Batch core (sources.capture) stays the tested unit; this wrapper adds the
continuous trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from komodo_data_spark.schemas import CAPTURE_FILE_SCHEMA

#: Dead-letter column for malformed records. Batch ingest FAILFASTs per
#: capture (sources/capture.py — the reference's per-file isolation); a
#: stream must NOT die on one bad file, so malformed records land here and
#: are filtered from the main sink instead (count them for alerting).
CORRUPT_COL = "_corrupt_record"

_STREAM_SCHEMA = StructType(
    list(CAPTURE_FILE_SCHEMA.fields) + [StructField(CORRUPT_COL, StringType())]
)


def start_capture_stream(
    spark: SparkSession,
    captures_glob: str,
    data_table_path: str,
    checkpoint_path: str,
    trigger_seconds: int = 10,
    available_now: bool = False,
    multiline: bool = False,
) -> StreamingQuery:
    """Continuously ingest capture files matching ``captures_glob``.

    ``captures_glob`` should be ``{CAPTURES_DIR}/*/*/data``. Set
    ``multiline=True`` when capture files are JSON record *arrays* (what
    pandas.read_json consumed); leave False for JSON-lines files — with
    multiLine on, Spark parses only the first record of a JSONL file and
    silently drops the rest, so the two formats must not be mixed in one
    stream. Trigger default mirrors the reference's 10 s poll
    (process.py:469); ``available_now=True`` drains the backlog and stops
    (the batch-parity mode used in tests).
    """
    stream = (
        spark.readStream.schema(_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .option("multiLine", "true" if multiline else "false")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(captures_glob)
        # failure isolation, streaming form: drop (don't die on) malformed
        # records; the main sink only ever sees parsed rows
        .filter(F.col(CORRUPT_COL).isNull())
        .drop(CORRUPT_COL)
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", data_table_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("session_id")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
