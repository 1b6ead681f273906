"""Semantics pins for the join-strategy operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from komodo_data_spark.operators import join_strategies as J


def test_notin_with_null_in_subquery_is_empty(spark):
    """NOT IN three-valued logic: one NULL build key empties the result —
    the behavior a left-anti rewrite silently breaks."""
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "c_custkey long, c_name string"
    ).createOrReplaceTempView("naaj_customer")
    spark.createDataFrame(
        [(1, "F"), (None, "F")], "o_custkey long, o_orderstatus string"
    ).createOrReplaceTempView("naaj_orders")
    out = spark.sql(
        """
        SELECT c_custkey FROM naaj_customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM naaj_orders WHERE o_orderstatus = 'F'
        )
        """
    )
    assert out.count() == 0


def test_naaj_plan_is_null_aware(spark, sf_dir):
    out = J.customers_no_f_orders_notin(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Spark 4.1 prints the isNullAware flag as a trailing `true` on the
    # LeftAnti BroadcastHashJoin (older versions printed `NAAJ`).
    assert "LeftAnti, BuildRight, true" in plan or "NAAJ" in plan, plan


def test_salted_join_spreads_hot_key(spark):
    """Every build row must appear under all salts; a hot key's probe rows
    land in more than one salt bucket."""
    probe = spark.range(0, 1000).select(
        F.lit(42).alias("k"), F.col("id").alias("o_orderkey")
    )
    salted = probe.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(J.N_SALTS)).cast("int")
    )
    n_buckets = salted.select("salt").distinct().count()
    assert n_buckets == J.N_SALTS
