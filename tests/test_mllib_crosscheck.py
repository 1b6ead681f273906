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
