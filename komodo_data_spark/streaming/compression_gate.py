"""Streaming zlib compression-ratio gate for document ingestion.

The batch operator (``operators/text_analysis.text_compression_ratio``)
scores a finished corpus; an ingestion pipeline wants the same verdict at
the edge: documents whose zlib ratio falls outside the keep band
(degenerate repetition, random/binary-like payloads) are quarantined
before they land in the clean corpus. Both sides call ONE kernel
(``text_analysis.compression_frame``), so the gate and the batch scorer
cannot disagree about any document — the same shared-definition rule as
the PII gate (``expectations.docs_rules``) and the band/block stores.

Per micro-batch: score with the shared mapInPandas kernel, join the
verdict back to the full-width rows (the kernel returns only its five
score columns), split keep/quarantine, and write each side to the batch's
own ``epoch_id=N`` partition with dynamic overwrite — the repo-wide
epoch-idempotent write contract (an at-least-once replay overwrites its
own partitions rather than duplicating).

Scale: the kernel is map-only; the only shuffle is the doc_id verdict
join, which at micro-batch size is broadcast by AQE. Python appears only
where zlib demands it — the one sanctioned row-bytes stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from komodo_data_spark.operators.text_analysis import compression_frame


def compression_gate_batch(
    batch_df: DataFrame,
    epoch_id: int,
    clean_path: str,
    quarantine_path: str,
) -> None:
    scored = compression_frame(
        batch_df.select("doc_id", "text")
    ).select("doc_id", "compression_ratio", "keep")
    annotated = (
        batch_df.join(scored, "doc_id")
        .withColumn("epoch_id", F.lit(int(epoch_id)))
        # two output branches must not re-read the source batch (or re-run
        # the Python stage); same contract as expectations.gate_batch
        .localCheckpoint(eager=True)
    )
    (
        annotated.filter(F.col("keep"))
        .drop("keep")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(clean_path)
    )
    (
        annotated.filter(~F.col("keep"))
        .drop("keep")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(quarantine_path)
    )


def start_docs_compression_gate(
    spark: SparkSession,
    docs_dir: str,
    clean_path: str,
    quarantine_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Gate a documents file-source stream on the zlib keep band."""
    schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda b, e: compression_gate_batch(
                b, e, clean_path, quarantine_path
            )
        )
        .trigger(availableNow=True)
        .start()
    )
