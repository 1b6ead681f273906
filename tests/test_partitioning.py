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


# --------------------------------------------------------------------------
# Z-order layout: 2-D min/max file skipping
# --------------------------------------------------------------------------


def _file_minmax(path: str, cols: list[str]):
    """Per-file [min, max] of each column from the parquet footers — the
    exact stats a reader consults to skip files."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for i in range(md.num_columns):
                col = md.row_group(rg).column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    mins[name] = mn if mins[name] is None else min(mins[name], mn)
                    maxs[name] = mx if maxs[name] is None else max(maxs[name], mx)
        out.append((mins, maxs))
    return out


def test_zorder_layout_skips_files_on_2d_box(spark, sf_dir, tmp_path_factory):
    """Z-ordered files must let a (ts_ms, value) box filter skip most files
    on footer stats, where a round-robin layout can skip none — the
    second-dimension pruning story partitionBy can't provide. Both box
    dimensions are high-cardinality (time × metric), the query shape
    Z-order exists for; a dimension with fewer distinct values than files
    (user_id here has 15 at sf0.001) can't be isolated by ANY layout."""
    from komodo_data_spark.sources.layout import zorder_write

    base = tmp_path_factory.mktemp("zorder")
    ev = load_events(spark, sf_dir).select("event_id", "ts_ms", "value")

    z_path = str(base / "zordered")
    rr_path = str(base / "roundrobin")
    zorder_write(ev, z_path, "ts_ms", "value", n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rr_path)

    # box: middle ~20% of each dimension
    q = ev.stat.approxQuantile(["ts_ms", "value"], [0.4, 0.6], 0.001)
    (t_lo, t_hi), (v_lo, v_hi) = q[0], q[1]

    def overlapping(path):
        hits = 0
        for mins, maxs in _file_minmax(path, ["ts_ms", "value"]):
            if mins["ts_ms"] <= t_hi and maxs["ts_ms"] >= t_lo and \
               mins["value"] <= v_hi and maxs["value"] >= v_lo:
                hits += 1
        return hits

    z_hits, rr_hits = overlapping(z_path), overlapping(rr_path)
    # every round-robin file spans the whole space; z-order must beat it
    assert rr_hits == 16
    assert z_hits < rr_hits / 2, f"z-order skipped too little: {z_hits}/16"

    # layout change must not change query results
    box = (F.col("ts_ms").between(t_lo, t_hi)
           & F.col("value").between(v_lo, v_hi))
    assert (
        spark.read.parquet(z_path).filter(box).count()
        == ev.filter(box).count()
    )


def test_dynamic_partition_pruning_fires(spark, partitioned_events, tmp_path):
    """Joining the date-partitioned fact to a filtered date dim must inject
    a dynamicpruning expression into the fact scan's PartitionFilters —
    at 100 TB this is what keeps a fact⋈dim join from scanning every date
    partition when the dim filter only selects a few. (Stats-based benefit
    estimation is disabled: the heuristic rightly rejects DPP on KB-sized
    local fixtures, but the plan shape is what we pin here.)"""
    confs = {
        "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10000",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(partitioned_events)
        dim_path = str(tmp_path / "date_dim")
        (fact.select("event_date").distinct()
             .withColumn("tag", F.dayofmonth("event_date"))
             .write.mode("overwrite").parquet(dim_path))
        dim = spark.read.parquet(dim_path).filter(F.col("tag") <= 2)
        j = fact.join(F.broadcast(dim), "event_date").groupBy("event_date").count()

        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "dynamicpruning" in buf.getvalue().lower()
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """With runtime bloom filters on, a selective shuffle join must inject
    might_contain() onto the large side's scan — the row-group-level
    pre-filter that cuts shuffle volume for selective fact⋈fact joins at
    scale. (Size thresholds zeroed: the defaults require a 10 GB scan.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = load_events(spark, sf_dir)
        small = load_events(spark, sf_dir).filter(F.col("value") > 39).select(
            "event_id"
        )
        j = big.join(small, "event_id").groupBy("event_type").count()

        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "might_contain" in buf.getvalue().lower()
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join must split a pathologically hot key's sort-merge
    partition into multiple tasks (the runtime half of the salting story:
    join_strategies salts when writing the query, AQE rescues unsalted
    SMJs at runtime). Thresholds lowered — the defaults trigger at 256 MB
    partitions, three orders above test data."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # probe side: one hot key (90% of rows) + long tail; build side:
        # unique keys, so the join doesn't multiply rows and the only
        # oversized partition is the probe's hot one
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") % 10 < 9, 42).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 100_000).select(
            F.col("id").alias("k"),
            F.sha2((F.col("id") + 7).cast("string"), 256).alias("pad2"),
        )
        # aggregate OVER the payloads so column pruning can't strip them —
        # an all-constant key column compresses below the skew threshold
        j = left.join(right, "k").agg(
            F.sum(F.length("pad")).alias("a"), F.sum(F.length("pad2")).alias("b")
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cbo_table_stats_feed_the_optimizer(spark, sf_dir, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS must land row/size stats in the
    catalog and surface them in the optimized plan — the input the
    cost-based join-reorder and broadcast decisions read on a warehouse
    deployment (file-scan relations fall back to size-on-disk only)."""
    from komodo_data_spark.sources.tables import load_table

    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "cbo_nation"
    )
    saved_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        # rowCount only reaches plan stats when the cost-based optimizer is
        # on; without it Spark propagates sizeInBytes alone.
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
        stats = (
            spark.table("cbo_nation")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == 25
        assert int(str(stats.sizeInBytes())) > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved_cbo)
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_load_spread_rebalances_only_unsplittable_layouts(spark, sf_dir, tmp_path):
    """load_spread round-robin repartitions ONLY when the scan cannot feed
    every core: the single-file testdata layout gets the rebalance Exchange;
    a multi-file layout with >= cores splits loads with NO Repartition node
    — at 100 TB that node would be an avoidable full shuffle of the corpus
    on every dedup/text query. Results must be identical either way."""
    import os

    import pyarrow.parquet as pq

    from komodo_data_spark.sources.tables import (
        estimated_scan_splits,
        load_spread,
        table_path,
    )

    cores = spark.sparkContext.defaultParallelism

    # single unsplittable file -> estimate 1 -> rebalance present
    assert estimated_scan_splits(spark, table_path(sf_dir, "documents")) < cores
    single = load_spread(spark, sf_dir, "documents")
    assert "Repartition" in single._jdf.queryExecution().optimizedPlan().toString()
    assert single.rdd.getNumPartitions() == cores

    # many-file layout (>= cores files) -> estimate >= cores -> NO rebalance
    d = str(tmp_path / "multi")
    tb = pq.read_table(table_path(sf_dir, "documents"))
    os.makedirs(os.path.join(d, "documents.parquet"))
    step = -(-tb.num_rows // (cores * 2))
    for i in range(cores * 2):
        part = tb.slice(i * step, step)
        if part.num_rows:
            pq.write_table(
                part, os.path.join(d, "documents.parquet", f"part-{i}.parquet")
            )
    assert estimated_scan_splits(spark, table_path(d, "documents")) >= cores
    multi = load_spread(spark, d, "documents")
    assert "Repartition" not in multi._jdf.queryExecution().optimizedPlan().toString()

    # same rows either way
    assert multi.count() == single.count() == tb.num_rows

    # an unlistable (object-store-style) path is assumed splittable
    assert (
        estimated_scan_splits(spark, "s3://bucket/table.parquet") == cores
    )
