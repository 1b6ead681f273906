"""Streaming k-anonymity RELEASE gate for customer-record ingestion.

The batch operator (``operators/pipeline_ops.customers_k_anonymity``)
audits a finished table for quasi-identifier classes below the K_ANON
floor; a release pipeline wants that verdict at the edge, BEFORE a
record reaches the exportable store. k-anonymity is a corpus property —
a class only ever grows — so the streaming-correct form is
hold-and-release, not drop: a record is released iff its QI class's
ACCUMULATED count (every prior epoch's store partitions plus the current
batch) has reached k at its ingestion epoch; otherwise it parks in the
held area. Both sides derive the class through ONE kernel
(``pipeline_ops.qi_classes`` / ``QI_COLS``), the repo's shared-kernel
rule (PII, compression, decontamination gates) — gate and audit cannot
disagree about a record's equivalence class by construction.

Per-epoch verdicts are FINAL for that epoch, the same contract as the
decontamination gate: a verdict was correct against the store as of
ingestion, and promoting earlier held records once their class crosses k
is the periodic batch job's business (read held, semi-join classes now
>= k in the store — one line with the same kernel), not a retroactive
rewrite of published epochs. This keeps every write epoch-idempotent:

- class-count store: parquet partitioned by ``epoch_id``; each batch
  writes ITS OWN class counts with dynamic overwrite, so an
  at-least-once replay overwrites the identical partition and the
  accumulated fold (groupBy-sum at read) never double-counts.
- released / held: one partition per epoch, dynamic overwrite, verdicts
  deterministic given (store-so-far, batch) — crash anywhere and the
  replayed epoch reproduces byte-identical outputs.

Scale: the store folds |classes| x |epochs| rows — bounded by the QI
domain, not the record count (the same O(1)-fold retention argument as
the mix counter store; compact epochs into a base partition on the same
schedule if releases run for years). The verdict join broadcasts the
folded class counts; record rows never shuffle. Per-batch latency is
flat over stream lifetime (BENCH_STREAM row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from komodo_data_spark.operators.pipeline_ops import K_ANON, QI_COLS, qi_classes


def accumulated_class_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold every published epoch's class counts: (QI_COLS..., acc_n)."""
    return (
        spark.read.parquet(store_path)
        .groupBy(*QI_COLS)
        .agg(F.sum("n").cast("long").alias("acc_n"))
    )


def k_anonymity_gate_batch(
    batch_df: DataFrame,
    epoch_id: int,
    store_path: str,
    released_path: str,
    held_path: str,
    k: int = K_ANON,
) -> None:
    spark = batch_df.sparkSession
    qi = qi_classes(batch_df).localCheckpoint(eager=True)
    # 1. publish THIS epoch's class counts (idempotent: replay overwrites
    #    the same partition with the same counts)
    (
        qi.groupBy(*QI_COLS)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(store_path)
    )
    # 2. verdict against the accumulated counts (now includes this epoch);
    #    broadcast: the folded frame is QI-domain-sized, never record-sized
    acc = accumulated_class_counts(spark, store_path)
    annotated = (
        qi.join(F.broadcast(acc), list(QI_COLS), "left")
        .withColumn("releasable", F.coalesce("acc_n", F.lit(0)) >= F.lit(k))
        .withColumn("epoch_id", F.lit(int(epoch_id)))
        # two output branches must not re-run the verdict join
        .localCheckpoint(eager=True)
    )
    for flag, path in ((True, released_path), (False, held_path)):
        (
            annotated.filter(F.col("releasable") == F.lit(flag))
            .drop("releasable")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(path)
        )


def start_k_anonymity_gate(
    spark: SparkSession,
    customers_dir: str,
    store_path: str,
    released_path: str,
    held_path: str,
    checkpoint: str,
    k: int = K_ANON,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Gate a customer file-source stream on accumulated k-anonymity."""
    schema = spark.read.parquet(customers_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(customers_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda b, e: k_anonymity_gate_batch(
                b, e, store_path, released_path, held_path, k
            )
        )
        .trigger(availableNow=True)
        .start()
    )


def promote_held(
    spark: SparkSession, store_path: str, held_path: str, k: int = K_ANON
) -> DataFrame:
    """The periodic batch companion: held records whose class has since
    reached k — releasable NOW. Pure read-side (no state mutation here;
    the caller moves/publishes them under its own write-audit-publish),
    one broadcast semi-join through the same kernel columns."""
    ok = accumulated_class_counts(spark, store_path).filter(
        F.col("acc_n") >= F.lit(k)
    )
    held = spark.read.parquet(held_path)
    return held.join(
        F.broadcast(ok.select(*QI_COLS)), list(QI_COLS), "left_semi"
    )
