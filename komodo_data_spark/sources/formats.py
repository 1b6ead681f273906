"""Result-frame round-trip helpers for every sink/source format the engine
speaks: parquet (canonical storage), CSV (the reference's export format,
process.py:100-107), and JSON-lines (the reference's capture input format).

The reference only ever *writes* CSV and *reads* JSON; a complete engine
needs read+write on each so results can re-enter pipelines. Schema fidelity
rules enforced here:

- parquet: lossless, self-describing — the default for anything re-read.
- orc: the other self-describing columnar format Spark speaks natively
  (ecosystem interchange; same lossless rules as parquet).
- csv/json: schema is NOT self-describing (csv untyped, json loses ints vs
  longs); both readers therefore require the caller to pass the schema the
  writer saved (``schema_of``), never inference — inference over 100 TB is a
  full extra scan and non-deterministic under sampling.
- Writes go through a single ``coalesce(n_files)`` only when the caller asks
  for export-style output (the reference's one-file CSV contract);
  distributed writes keep the natural partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "csv", "json")
# avro is deliberately absent: Spark ships it as an EXTERNAL module
# (spark-avro jar), which is not on this container's classpath — probing
# `.format("avro")` raises AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE / "Failed
# to find data source". The gated test in tests/test_extensions.py
# documents the environment boundary and activates the path automatically
# wherever the jar is deployed.


def schema_of(df: DataFrame) -> str:
    """DDL string for re-reading csv/json output of ``write_result``."""
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )


def write_result(
    df: DataFrame, path: str, fmt: str = "parquet", single_file: bool = False
) -> None:
    """Write a result frame in ``fmt``. ``single_file=True`` mirrors the
    reference's one-CSV-per-request export (coalesce(1) — only for small
    result frames; large frames keep their partitioning)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def read_result(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Read a frame written by ``write_result``. csv/json require ``schema``
    (the writer's ``schema_of`` string)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read
    if fmt in ("parquet", "orc"):
        return getattr(reader, fmt)(path)
    if schema is None:
        raise ValueError(f"{fmt} round-trip requires the writer's schema")
    reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        return reader.csv(path)
    return reader.json(path)
