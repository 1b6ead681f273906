"""Shared retention for epoch-partitioned fact stores.

Both the MinHash band store (``dedup_incremental``) and the block store
(``block_scrub``) accumulate one parquet partition per micro-batch epoch
and fold history with the same routine: DISTINCT the fact rows into the
reserved ``epoch_id=-1`` base partition, then prune the folded epoch
directories. This module is that routine, shared so a safety fix lands in
one place.

Crash-window safety: epochs commit in order, so at most the HIGHEST epoch
in the store can belong to a batch whose checkpoint has not committed yet
(the store write happens before the commit). Folding that epoch into the
base would teach ``block_scrub``'s strictly-earlier-epoch history filter
to treat the replayed batch's own blocks as history — scrubbing every
block of every replayed doc. Callers whose per-batch output is NOT
monotone must therefore either exclude the max epoch (safe without any
coordination) or pass the committed epoch bound from the streaming
query's progress. Monotone stores (band candidates: a replay re-derives
the identical pair set) may fold everything.

Same local-filesystem prune caveat as ``sketches.compact_store``: on an
object store, swap the rmtree for the Hadoop FileSystem delete.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_distinct_store(
    spark: SparkSession,
    store_path: str,
    cols: Sequence[str],
    keep_max_epoch: bool = False,
    committed_through: int | None = None,
) -> int:
    """Fold epoch partitions of a DISTINCT-mergeable store into the
    ``epoch_id=-1`` base. Returns the number of epochs folded.

    ``committed_through`` folds only epochs <= that bound (use the last
    committed batch id from StreamingQueryProgress). Otherwise
    ``keep_max_epoch=True`` excludes the highest epoch — the only one
    that can be uncommitted. With neither, every epoch folds.
    """
    from pyspark.errors import AnalysisException

    try:
        store = spark.read.parquet(store_path)
    except AnalysisException as exc:
        # A store that never accumulated a fact (missing path, or a dir
        # with zero partitions from empty-frame writes) has nothing to
        # fold; other read failures propagate.
        if exc.getCondition() not in (
            "PATH_NOT_FOUND",
            "UNABLE_TO_INFER_SCHEMA",
        ):
            raise
        return 0
    epochs = sorted(
        r["epoch_id"]
        for r in store.select("epoch_id").distinct().collect()
        if r["epoch_id"] != -1
    )
    if committed_through is not None:
        epochs = [e for e in epochs if e <= committed_through]
    elif keep_max_epoch and epochs:
        epochs = epochs[:-1]
    if not epochs:
        return 0
    base = (
        store.filter(
            (F.col("epoch_id") == -1) | F.col("epoch_id").isin(epochs)
        )
        .select(*cols)
        .distinct()
        .withColumn("epoch_id", F.lit(-1))
        .localCheckpoint(eager=True)
    )
    (
        base.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(store_path)
    )
    for e in epochs:
        shutil.rmtree(os.path.join(store_path, f"epoch_id={e}"))
    return len(epochs)


_MISSING_STORE_CONDITIONS = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def read_store_or_empty(spark: SparkSession, path: str, schema) -> "DataFrame":
    """Read an epoch-partitioned store, treating a missing path (or a dir
    holding only empty-frame write metadata) as an EMPTY frame of the
    given schema. For stores whose absence is a legitimate state — e.g.
    the k-anonymity held area before any record was ever parked — not a
    misconfiguration (for those, use :func:`require_store`)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as exc:
        if exc.getCondition() not in _MISSING_STORE_CONDITIONS:
            raise
        return spark.createDataFrame([], schema)


def require_store(spark: SparkSession, path: str, what: str) -> None:
    """Fail FAST with a clear precondition error if a store a streaming
    gate depends on has never been published. Without this, the first
    micro-batch's ``spark.read.parquet(store)`` inside foreachBatch throws
    a bare path-not-found and kills the whole streaming query — the
    operator error ('you forgot to publish the benchmark / model') should
    surface at start_*() time instead."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path).schema
    except AnalysisException as exc:
        if exc.getCondition() not in _MISSING_STORE_CONDITIONS:
            raise
        raise RuntimeError(
            f"{what} store at '{path}' has never been published — "
            f"publish it before starting the gate (empty or missing path)"
        ) from exc
