"""Round-11 operator tests: candidate-volume overflow hardening, the
BPE cascade-conflict predicate, published/shared model fits (BPE +
IVFPQ), capped sf10 fallbacks for the guard-refusing detectors, and the
fused guard frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# ---------------------------------------------------------------------------
# candidate-volume guard: overflow hardening (round-10 ADVICE, medium)
# ---------------------------------------------------------------------------


def test_candidate_volume_estimate_is_double_typed(spark):
    """The guard's Σ c_a·c_b fold must run in DOUBLE, not BIGINT: one hot
    key with >~3e9 rows per side wraps an int64 product under non-ANSI
    Spark, goes negative, and fails the guard OPEN on exactly the
    degenerate input it exists to refuse. Pin the estimate frame's type
    for both the self-join and two-sided forms."""
    from komodo_data_spark.operators.dedup import _candidate_volume_frame

    a = spark.createDataFrame([(1, "k"), (2, "k")], "doc_id long, g string")
    b = spark.createDataFrame([(3, "k")], "doc_id long, g string")
    for frame in (
        _candidate_volume_frame(a, ["g"]),
        _candidate_volume_frame(a, ["g"], b),
    ):
        assert isinstance(frame.schema["v"].dataType, DoubleType)
    # and the values are still the exact Σ c_a·c_b
    from komodo_data_spark.operators.dedup import join_candidate_volume

    assert join_candidate_volume(a, ["g"]) == 4
    assert join_candidate_volume(a, ["g"], b) == 2


def test_candidate_volume_double_fold_survives_int64_wrap(spark):
    """The exact expression shape the guard folds — sum(ca*cb) — overflows
    int64 at the adversarial density (4e9² per side): under ANSI (Spark 4
    default) the estimate CRASHES instead of classifying the refusal, and
    under non-ANSI it wraps negative and fails the guard OPEN. The double
    fold stays positive and monotone. This pins WHY the cast exists."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    counts = spark.createDataFrame(
        [(4_000_000_000, 4_000_000_000)], "ca long, cb long"
    )
    with pytest.raises((ArithmeticException, Py4JJavaError)):
        counts.select(F.sum(F.col("ca") * F.col("cb")).alias("v")).first()
    ok = counts.select(
        F.sum(F.col("ca").cast("double") * F.col("cb")).alias("v")
    ).first()["v"]
    assert ok == pytest.approx(1.6e19)
