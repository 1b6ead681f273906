"""Loaders for the driver-provided synthetic tables (/root/testdata/sf*).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each (TESTDATA.md).

``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet reader
rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is set; the loader
applies the engine confs first, and `load_events` normalizes the raw nanos
long into both an epoch-millis long (`ts_ms`) and a proper timestamp
(`ts_ts`) so downstream operators never re-derive them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from komodo_data_spark.session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` (raw nanos long) plus derived `ts_ms` and `ts_ts`."""
    ev = load_table(spark, sf_dir, "events")
    # Integer division, never double: nanos (~1.7e18) exceed double's 53-bit
    # mantissa, so (ts/1e6).cast('long') is off by 1 ms on exact-ms stamps.
    return ev.withColumns(
        {
            "ts_ms": F.expr("ts div 1000000"),
            "ts_ts": F.timestamp_micros(F.expr("ts div 1000")),
        }
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
