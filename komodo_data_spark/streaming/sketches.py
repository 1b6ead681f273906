"""Incremental frequency-sketch maintenance over the events stream.

The streaming sibling of operators/stats_ops.events_heavy_hitters_merged:
each micro-batch collapses to ONE persisted approx_top_k state row
(appended to a parquet sketch store via ``foreachBatch``), and the heavy-
hitter query combines + estimates over the stored sketches at read time —
no replay of ingested batches, ever.

Why this shape at 100 TB: the per-batch write is O(sketch) ≈ KBs no matter
how many rows the batch carried, the store grows by one row per batch (not
per key), and the read-side combine is a single tiny aggregation. Appends
are idempotent per epoch via the epoch_id column — a replayed batch
overwrites its own partition instead of double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

MAX_ITEMS_TRACKED = 100_000


def accumulate_batch(
    spark: SparkSession, batch_df: DataFrame, epoch_id: int, sketch_path: str
) -> None:
    """Collapse one micro-batch into a single sketch row, written to the
    epoch's own partition (idempotent under micro-batch replay)."""
    sk = batch_df.agg(
        F.expr(f"approx_top_k_accumulate(user_id, {MAX_ITEMS_TRACKED})").alias("sk")
    ).withColumn("epoch_id", F.lit(int(epoch_id)))
    (
        sk.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(sketch_path)
    )


def start_sketch_maintenance(
    spark: SparkSession,
    events: DataFrame,
    sketch_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain the per-batch sketch store from a streaming events frame."""
    return (
        events.select("user_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch_df, epoch: accumulate_batch(
                spark, batch_df, epoch, sketch_path
            )
        )
        .trigger(availableNow=True)
        .start()
    )


def heavy_hitters_from_store(
    spark: SparkSession, sketch_path: str, min_events: int, k: int = 1000
) -> DataFrame:
    """Combine every stored batch sketch and return keys with
    count >= min_events — same output contract as stats_ops'
    events_heavy_hitters, without touching the raw events.

    No driver-local existence pre-check: the store path may live on any
    Hadoop-visible filesystem (s3://, hdfs://, ...), where ``os.path``
    would wrongly report absence. A missing store surfaces as Spark's own
    scheme-aware PATH_NOT_FOUND from the read itself."""
    store = spark.read.parquet(sketch_path)
    # approx_top_k_combine over ZERO rows crashes (scala.MatchError) — seed
    # with a valid empty sketch so an empty store means "no hitters yet"
    seed = (
        spark.range(0)
        .selectExpr("id AS user_id")
        .agg(
            F.expr(
                f"approx_top_k_accumulate(user_id, {MAX_ITEMS_TRACKED})"
            ).alias("sk")
        )
    )
    merged = store.select("sk").unionByName(seed).agg(
        F.expr(
            f"approx_top_k_estimate("
            f"approx_top_k_combine(sk, {MAX_ITEMS_TRACKED}), {k})"
        ).alias("tk")
    )
    return (
        merged.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("user_id"), F.col("e.count").alias("n_events"))
        .filter(F.col("n_events") >= min_events)
    )


def compact_store(spark: SparkSession, sketch_path: str) -> int:
    """Fold every per-epoch sketch row into ONE base row so the store stays
    O(1) instead of one-row-per-batch forever — the retention pass that
    makes the per-epoch write pattern sustainable over years of batches.

    Mergeability is the whole point of the sketch choice: combine(combine(
    a, b), c) == combine(a, b, c), so folding historical epochs into a base
    row changes no downstream estimate (pinned by test). The base lands in
    the reserved ``epoch_id=-1`` partition via the same dynamic-overwrite
    write the stream uses; old epoch directories are removed only AFTER the
    base commit (write-then-prune — a crash between the two steps leaves a
    double-counted base + epoch? No: the base is built FROM the epochs and
    replaces them; until pruning completes, readers see base + originals,
    so the estimate can transiently over-count. Run compaction while the
    maintenance stream is paused, or read through a snapshot listing, the
    same operational contract as parquet compaction in sources/compaction).

    Returns the number of epoch partitions folded away. Pruning uses the
    local filesystem API (this rig); on s3://-style stores swap the rmtree
    for the Hadoop FileSystem delete, same two-step contract.
    """
    import shutil

    store = spark.read.parquet(sketch_path)
    epochs = [
        r["epoch_id"]
        for r in store.select("epoch_id").distinct().collect()
        if r["epoch_id"] != -1
    ]
    if not epochs:
        return 0
    base = (
        store.agg(
            F.expr(f"approx_top_k_combine(sk, {MAX_ITEMS_TRACKED})").alias("sk")
        ).withColumn("epoch_id", F.lit(-1))
    )
    # materialize BEFORE overwriting: the combine must not lazily re-read
    # partitions mid-delete
    base = base.localCheckpoint(eager=True)
    (
        base.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(sketch_path)
    )
    for e in epochs:
        shutil.rmtree(os.path.join(sketch_path, f"epoch_id={e}"))
    return len(epochs)
