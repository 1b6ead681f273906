"""PQ-coded incremental ANN index (frozen IVFPQ model + streaming encoder).

The float store (``ann_incremental.py``) carries each indexed vector as 64
raw doubles — fine as the oracle-anchored baseline, wrong at 100 TB of
vectors (round-7 verdict #3): the corpus-sized side of an ANN index should
carry PQ codes, the layout the batch ``knn_ivfpq_adc`` rung already
computes. This module is that upgrade:

1. ``publish_ivfpq_model`` freezes the index GEOMETRY from a training
   corpus: the k-means coarse cells and the per-subspace residual
   codebooks from the shared batch fit (``similarity._ivfpq_fit`` — one
   code path, no drift). Production refreshes the model on a schedule;
   between refreshes it is immutable, which is what makes streaming
   encoding embarrassingly parallel.
2. ``encode_batch`` encodes each micro-batch of arrivals against the
   frozen model — nearest coarse cell (broadcast argmin, the exact
   expression the batch fit uses), residual, per-subspace code argmin —
   and appends (vec_id, cell_id, codes) rows to the batch's own
   ``epoch_id=N`` partition with dynamic overwrite (the band/block-store
   idempotent-replay pattern).
3. ``knn_from_pq_store`` serves ADC top-k from the store alone: candidate
   generation is the cell_id equi-join against the probed cells,
   reconstruction is a broadcast codebook join, queries stay exact
   floats. Identical results to batch ``knn_ivfpq_adc`` over the same
   accumulated rows when the model was fit on that corpus (pinned by the
   stream==batch test).

Store width: a row is (vec_id, cell_id, PQ_M=4 small-int codes) instead of
(vec_id, bucket, 64 doubles, norm) — 4 codes vs 512 bytes of floats
(256× in-memory for the vector payload; measured 43.9× on disk at sf0.001
against the float store over identical rows — 4,635 vs 203,594 bytes,
parquet encoding included; the gap narrows from 256× because both stores
pay per-row vec_id/metadata overhead. Pinned >= 4× by
test_incremental_pq_index_matches_batch_ivfpq).

Scale (100 TB of vectors): the store is O(corpus) rows but each row is a
few bytes of codes; probes equi-join on cell_id with the query side
broadcast, so the store never shuffles, and the model (cells + codebooks)
is KMEANS_K + M·IVFPQ_K rows regardless of corpus size. Retention:
``compact_pq_store`` folds epoch partitions via the shared DISTINCT fold
(code rows are plain facts; encoding against a frozen model is monotone —
a replayed batch re-derives identical rows).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from komodo_data_spark.operators.similarity import (
    IVF_PROBES,
    TOP_K,
    _cos_pre,
    _ivfpq_fit_shared,
    _nrm,
    _pq_subvectors,
    _sqdist,
)
from komodo_data_spark.streaming.stores import require_store

PQ_STORE_COLS = ("vec_id", "cell_id", "codes")


def _cells_path(model_path: str) -> str:
    return os.path.join(model_path, "cells")


def _codebooks_path(model_path: str) -> str:
    return os.path.join(model_path, "codebooks")


def publish_ivfpq_model(
    spark: SparkSession, sf_dir: str, model_path: str
) -> None:
    """Fit the batch IVFPQ index on a training corpus and freeze its
    geometry: coarse cells (cid, ce) and residual codebooks (m, cid, ce).
    Both frames are model-sized (KMEANS_K and PQ_M·IVFPQ_K rows), so the
    publish is a scan-heavy fit with a tiny write."""
    cells, _, cents, _ = _ivfpq_fit_shared(spark, sf_dir)
    cells.write.mode("overwrite").parquet(_cells_path(model_path))
    cents.write.mode("overwrite").parquet(_codebooks_path(model_path))


def read_ivfpq_model(
    spark: SparkSession, model_path: str
) -> tuple[DataFrame, DataFrame]:
    """(cells, codebooks) of a published model — tiny frames, meant to be
    broadcast by every consumer."""
    return (
        spark.read.parquet(_cells_path(model_path)),
        spark.read.parquet(_codebooks_path(model_path)),
    )


def encode_batch(
    batch_df: DataFrame, epoch_id: int, model_path: str, store_path: str
) -> None:
    """Encode one micro-batch of embeddings (vec_id, embedding) against
    the frozen model into (vec_id, cell_id, codes) rows. Every step is the
    batch fit's own expression run against the published frames: nearest
    cell = broadcast crossJoin + min-struct argmin, residual = zip_with
    subtraction, codes = per-subspace broadcast argmin over the codebook —
    so a vector encodes to the identical row in the stream and in batch
    ``knn_ivfpq_adc``'s build (the stream==batch parity pin)."""
    spark = batch_df.sparkSession
    cells, cents = read_ivfpq_model(spark, model_path)
    v = batch_df.filter(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    picked = (
        v.crossJoin(F.broadcast(cells))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    _sqdist(F.col("e"), F.col("ce")).alias("d"),
                    F.col("cid").alias("cid"),
                )
            )["cid"].alias("cell_id"),
            F.first("e").alias("e"),
        )
    )
    resid = picked.join(
        F.broadcast(cells), F.col("cell_id") == F.col("cid")
    ).select(
        "vec_id",
        "cell_id",
        F.zip_with("e", "ce", lambda x, c: x - c).alias("r"),
    )
    codes = (
        _pq_subvectors(resid, "r")
        .join(F.broadcast(cents), "m")
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(
                    _sqdist(F.col("s"), F.col("ce")).alias("d"),
                    F.col("cid").alias("cid"),
                )
            )["cid"].alias("cid")
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "cid"))),
                lambda x: x["cid"],
            ).alias("codes")
        )
    )
    rows = resid.select("vec_id", "cell_id").join(codes, "vec_id")
    (
        rows.select(*PQ_STORE_COLS)
        .withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(store_path)
    )


def start_incremental_pq_index(
    spark: SparkSession,
    emb_dir: str,
    model_path: str,
    store_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Stream an embeddings parquet directory into the PQ code store.
    The model must be published first (``require_store`` precondition —
    the operator error should surface here, not as a path-not-found
    inside the first micro-batch)."""
    require_store(spark, _cells_path(model_path), "IVFPQ coarse-cell")
    require_store(spark, _codebooks_path(model_path), "IVFPQ codebook")
    schema = spark.read.parquet(emb_dir).schema  # footer peek, no scan
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
        .select("vec_id", "embedding")
    )
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda b, e: encode_batch(b, e, model_path, store_path))
        .trigger(availableNow=True)
        .start()
    )


def read_pq_index(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The accumulated code store, one row per vec_id (cross-lineage
    duplicate epochs collapse to the highest epoch's row — same contract
    as the float store). None if nothing was ever indexed."""
    try:
        store = spark.read.parquet(store_path)
    except AnalysisException as exc:
        if exc.getCondition() in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            return None
        raise
    w = Window.partitionBy("vec_id").orderBy(F.desc("epoch_id"))
    return (
        store.withColumn("rn_", F.row_number().over(w))
        .filter(F.col("rn_") == 1)
        .select(*PQ_STORE_COLS)
    )


def knn_from_pq_store(
    spark: SparkSession,
    model_path: str,
    store_path: str,
    queries: DataFrame,
    top_k: int = TOP_K,
) -> DataFrame | None:
    """ADC top-k per query served from the code store alone — batch
    ``knn_ivfpq_adc`` over the accumulated corpus. ``queries`` is an
    exact-float (vec_id, embedding) frame (queries are never quantized;
    that is the A in ADC). Candidates = members of the IVF_PROBES nearest
    coarse cells via a cell_id equi-join; each candidate is reconstructed
    as cell centroid + codebook residual through broadcast joins; the
    store side never shuffles."""
    idx = read_pq_index(spark, store_path)
    if idx is None:
        return None
    cells, cents = read_ivfpq_model(spark, model_path)
    rrec = (
        idx.select(
            "vec_id", "cell_id", F.posexplode("codes").alias("m", "cid")
        )
        .join(F.broadcast(cents), ["m", "cid"])
        .groupBy("vec_id", "cell_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "ce"))),
                    lambda x: x["ce"],
                )
            ).alias("rr")
        )
    )
    rec = (
        rrec.join(F.broadcast(cells), F.col("cell_id") == F.col("cid"))
        .select(
            "vec_id",
            "cell_id",
            F.zip_with("ce", "rr", lambda c, r: c + r).alias("re"),
        )
        .withColumn("rnrm", _nrm(F.col("re")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("qd"), F.asc("cid"))
    q = (
        queries.filter(F.col("embedding").isNotNull())
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qe"),
        )
        .withColumn("qnrm", _nrm(F.col("qe")))
        .crossJoin(F.broadcast(cells))
        .withColumn("qd", _sqdist(F.col("qe"), F.col("ce")))
        .withColumn("crnk", F.row_number().over(wq))
        .filter(F.col("crnk") <= IVF_PROBES)
        .select("query_id", "qe", "qnrm", F.col("cid").alias("qcell"))
    )
    scored = rec.join(
        F.broadcast(q),
        (F.col("cell_id") == F.col("qcell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos_pre(F.col("qe"), F.col("re"), F.col("qnrm"), F.col("rnrm")).alias(
            "adc_cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "neighbor_id", "adc_cosine", "rnk")
    )


def compact_pq_store(spark: SparkSession, store_path: str) -> int:
    """Fold epoch partitions into the ``epoch_id=-1`` base. Code rows are
    DISTINCT-mergeable facts and encoding against a frozen model is
    monotone (a replayed batch re-derives identical rows), so folding
    every epoch is safe — the band-store argument."""
    from komodo_data_spark.streaming.stores import compact_distinct_store

    return compact_distinct_store(spark, store_path, list(PQ_STORE_COLS))
