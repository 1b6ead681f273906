"""Bucketed-table co-located join: the 100 TB technique for repeated
fact-fact joins (SURVEY.md §2.3). Writing both sides bucketed by the join
key lets Spark sort-merge-join them with NO Exchange on either side — the
shuffle is paid once at write time, then every subsequent join is free.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from komodo_data_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bt LOCATION '{loc}'")
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("bt.orders_b")
    (
        load_table(spark, sf_dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bt.lineitem_b")
    )
    yield "bt"
    spark.sql("DROP DATABASE bt CASCADE")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_db):
    o = spark.table("bt.orders_b")
    l = spark.table("bt.lineitem_b")
    joined = o.join(l, "o_orderkey").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    # tiny test tables would be broadcast otherwise; the bucketing payoff is
    # for fact-fact joins where broadcast is impossible — force that regime
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    # co-located buckets: no shuffle feeds the join (the only Exchange
    # allowed is the tiny post-join aggregation one)
    assert "Exchange" not in join_section

    # and the result matches the plain (shuffling) join
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )
