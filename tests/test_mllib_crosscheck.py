"""Cross-check the native MinHash-LSH dedup against Spark MLlib's
MinHashLSH: two independent implementations (different hash families) must
agree on which pairs are high-Jaccard near-duplicates.

This is a consistency test, not an oracle test — MLlib's hash seeds differ
from our md5-based family, so only the *verified* pair sets are comparable,
and both pipelines verify with exact Jaccard at the same threshold.
"""

from __future__ import annotations

import pytest
from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import functions as F

from komodo_data_spark.operators import dedup


def test_mllib_minhash_agrees_with_native(spark, sf_dir):
    sh = dedup._doc_shingles(spark, sf_dir).filter(F.size("sh") > 0).cache()

    cv = CountVectorizer(
        inputCol="sh", outputCol="features", binary=True, minDF=1.0
    ).fit(sh)
    feats = cv.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    # distance threshold 1 - j  (MLlib uses Jaccard distance)
    cand = lsh.approxSimilarityJoin(
        feats, feats, 1.0 - dedup.JACCARD_THRESHOLD, distCol="jd"
    )
    mllib_pairs = {
        (min(a, b), max(a, b))
        for a, b in (
            (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
            for r in cand.collect()
        )
        if a != b
    }

    native_pairs = {
        (r["doc_i"], r["doc_j"])
        for r in dedup.dedup_ngram_pairs(spark, sf_dir).collect()
    }

    # exact ground truth (ngram pairs) must be recovered by MLlib's LSH:
    # approxSimilarityJoin post-filters on TRUE Jaccard distance, so its
    # output is exactly the pairs with j >= threshold that its banding found
    assert native_pairs, "fixture should contain near-duplicate documents"
    recall = len(mllib_pairs & native_pairs) / len(native_pairs)
    assert recall >= 0.9
    # and nothing MLlib reports should be below the threshold per our exact
    # Jaccard (sanity: both sides verify, so sets should nearly coincide)
    assert mllib_pairs <= native_pairs


def test_mllib_brp_lsh_agrees_with_exact_embedding_pairs(spark, sf_dir):
    """Second independent crosscheck, on the VECTOR side: MLlib's
    BucketedRandomProjectionLSH (Euclidean) vs our exact block-pair cosine
    join. On L2-normalized vectors, cosine >= t  <=>  L2 <= sqrt(2-2t), so
    the two implementations must agree: every BRP-reported pair is a true
    pair (approxSimilarityJoin post-filters on exact distance) and with
    enough hash tables the recall of the exact set is high."""
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    from komodo_data_spark.operators.dedup import COSINE_THRESHOLD
    from komodo_data_spark.sources.tables import load_table

    v = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            array_to_vector(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("raw"),
        )
    )
    feats = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(v)
    dist_threshold = math.sqrt(2.0 - 2.0 * COSINE_THRESHOLD)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=10,
        seed=42,
    ).fit(feats)
    cand = lsh.approxSimilarityJoin(feats, feats, dist_threshold, distCol="d")
    mllib_pairs = {
        (min(a, b), max(a, b))
        for a, b in (
            (r["datasetA"]["vec_id"], r["datasetB"]["vec_id"])
            for r in cand.collect()
        )
        if a != b
    }

    exact_pairs = {
        (r["vec_i"], r["vec_j"])
        for r in dedup.dedup_embedding_pairs(spark, sf_dir).collect()
    }
    assert exact_pairs, "fixture should contain near-duplicate vectors"
    # soundness: BRP post-filters on true distance -> no false positives
    # (boundary pairs can flip on float rounding; require exact subset)
    assert mllib_pairs <= exact_pairs
    recall = len(mllib_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8
