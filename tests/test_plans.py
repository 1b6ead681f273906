"""Plan-quality regression tests: assert the physical plans keep the shapes
the 100 TB design depends on (predicate pushdown into parquet, column
pruning, broadcast joins for dims, equi-joins — never cartesian — for LSH
candidate generation, shuffle-free map stages for per-row text ops).

These guard against silent plan regressions: a refactor that breaks filter
pushdown still returns correct rows, so only a plan assertion catches it.
"""

from __future__ import annotations

import contextlib
import io

from komodo_data_spark.operators import dedup, relational, similarity, text_analysis

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q3_broadcasts_dims_and_pushes_filters(spark):
    plan = plan_of(relational.q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_q1_prunes_columns(spark):
    plan = plan_of(relational.q1_pricing_summary(spark, SF))
    assert "LessThanOrEqual(l_shipdate" in plan  # pushed, not post-scan
    # column pruning: the scan must not read the join key it doesn't need
    scan_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ][0]
    assert "l_orderkey" not in scan_schema
    assert "l_quantity" in scan_schema


def test_minhash_lsh_uses_equi_joins_only(spark):
    plan = plan_of(dedup.dedup_minhash_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_uses_equi_joins_only(spark):
    plan = plan_of(dedup.dedup_simhash(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_lsh_is_hash_join(spark):
    plan = plan_of(similarity.knn_lsh_signbits(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_text_token_stats_is_shuffle_free(spark):
    plan = plan_of(text_analysis.text_token_stats(spark, SF))
    assert "Exchange" not in plan  # pure map stage over the scan


def test_events_scan_prunes_props(spark):
    plan = plan_of(relational.events_hourly_rollup(spark, SF))
    scan_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ][0]
    assert "props" not in scan_schema  # only ts/event_type/value are read
