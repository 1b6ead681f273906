"""Explicit skew-salting: the manual technique behind AQE's skew-join
handling (SURVEY.md §2 scale notes). A hot join key is split across
SALT_N sub-keys on the fact side; the dim side is replicated once per salt.
Results must be identical to the plain join — only the partition histogram
changes (no partition holds the whole hot key anymore).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SALT_N = 8


def test_salted_join_equals_plain_join(spark):
    # skewed fact: 90% of rows share key 1
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise((F.col("id") % 100) + 2)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 102)], "k int, name string"
    )

    plain = fact.join(dim, "k").groupBy("name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )

    salted_fact = fact.withColumn(
        "salt", (F.rand(seed=7) * SALT_N).cast("int")
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_N)]))
    )
    salted = (
        salted_fact.join(salted_dim, ["k", "salt"])
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )

    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # the salt genuinely spreads the hot key: fact rows for k=1 land in >1
    # (k, salt) group
    n_groups = (
        salted_fact.filter(F.col("k") == 1)
        .select("salt")
        .distinct()
        .count()
    )
    assert n_groups > 1
