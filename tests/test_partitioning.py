"""Partition-layout tests: writing the events table partitioned by date must
give partition-pruned scans (PartitionFilters in the plan, only matching
directories read) — the primary 100 TB access-path optimization for the
ubiquitous time-range filters (SURVEY.md §4: partition `data` by session/
date so Catalyst prunes automatically)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from komodo_data_spark.sources.tables import load_events


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("events_part") / "events")
    ev = load_events(spark, sf_dir).withColumn(
        "event_date", F.to_date(F.col("ts_ts"))
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
    return path


def test_date_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_day = df.filter(F.col("event_date") == "2024-01-02")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert pf and "event_date" in pf[0]  # pruned at planning, not scanned

    # pruned read returns exactly the batch-filtered rows
    all_rows = df.filter(F.col("event_date") == "2024-01-02").count()
    assert one_day.count() == all_rows
    assert all_rows > 0


def test_partitioned_write_round_trips_all_rows(spark, sf_dir, partitioned_events):
    total = spark.read.parquet(partitioned_events).count()
    assert total == load_events(spark, sf_dir).count()
