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


def normalize_events(ev: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a canonical trio regardless of the physical
    parquet type: ``ts`` (epoch-nanos long), ``ts_ms`` (epoch-millis long),
    ``ts_ts`` (timestamp). The driver testdata has shipped ``ts`` both as
    TIMESTAMP(NANOS) (surfacing as a raw nanos long under ``nanosAsLong``)
    and as timestamp[us] (surfacing as TIMESTAMP_NTZ); with the session
    timezone pinned to UTC both derivations agree with the DuckDB oracles'
    ``epoch_ms(ts)``. Pure deterministic expressions — safe on streaming
    DataFrames too (streaming/windows.events_stream reuses this).
    """
    dt = ev.schema["ts"].dataType.simpleString()
    if dt == "bigint":
        # Integer division, never double: nanos (~1.7e18) exceed double's
        # 53-bit mantissa, so (ts/1e6).cast('long') is off by 1 ms on
        # exact-ms stamps.
        return ev.withColumns(
            {
                "ts_ms": F.expr("ts div 1000000"),
                "ts_ts": F.timestamp_micros(F.expr("ts div 1000")),
            }
        )
    # timestamp / timestamp_ntz: the NTZ→TIMESTAMP cast is wall-clock
    # identity under the UTC session timezone.
    return ev.withColumns(
        {
            "ts": F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
            "ts_ms": F.expr("unix_micros(cast(ts as timestamp)) div 1000"),
            "ts_ts": F.col("ts").cast("timestamp"),
        }
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` (epoch-nanos long) plus derived `ts_ms` and `ts_ts`."""
    return normalize_events(load_table(spark, sf_dir, "events"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
