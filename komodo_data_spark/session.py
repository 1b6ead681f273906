"""SparkSession factory with the engine's standard configuration.

Parity notes (reference: /root/reference/process.py):
- Timezone pinned to UTC: all reference time math is on raw epoch millis
  (process.py:204), so plans must never apply a local-TZ shift.
- Arrow enabled: result export (the reference's CSV sink, process.py:100-107)
  goes through toPandas(); Arrow batches make that a columnar copy.
- AQE on: runtime re-planning (skew joins, coalesced shuffle partitions) is
  the 100 TB insurance policy for the extension joins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Session-level confs applied to every session this engine touches. These are
# all runtime-settable, so they can also be applied to an externally provided
# session via `configure(spark)`.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The driver-provided events.parquet stores TIMESTAMP(NANOS), which the
    # vectorized parquet reader rejects; read it as raw nanos longs instead
    # (we do all event-time math on epoch integers anyway, like the reference).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this build — leave the session's
            # existing value; every conf above is per-query correct by default.
            pass
    return spark


def get_spark(
    app_name: str = "komodo-data-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    ``shuffle_partitions`` defaults to 32 to match the local[32] test rig; on
    a real cluster leave spark.sql.shuffle.partitions to AQE by passing a
    high initial value (AQE coalesces down, never up).
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
