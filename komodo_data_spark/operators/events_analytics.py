"""The five komodo analytics re-targeted at the driver's `events` table.

The reference's `data` table doesn't exist in /root/testdata, so for the
driver's DuckDB-oracle gate each reference workload (SURVEY.md §2) is run over
`events`, which is shape-compatible: event_id≈seq, ts, user_id≈client_id,
event_type≈type, props≈message. Semantics per operator mirror the reference
SQL (filter → JSON extraction → agg/window), with the same MySQL `->`
compatibility helpers; the reference-shaped originals live in
operators/analytics.py and are oracle-tested in tests/test_analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from komodo_data_spark.functions.json_compat import jget, jget_num
from komodo_data_spark.sources.tables import load_events

ENTITY_NAMES = ["head", "left_hand", "right_hand", "spawned_entity"]


def interaction_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate_interaction_type analog (process.py:79-88): events of one
    type counted per user; count(props) keeps the non-NULL-count semantics."""
    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("props").alias("interaction_count"))
    )


def interaction_counts_oracle() -> str:
    return """
    SELECT user_id, count(props) AS interaction_count
    FROM events WHERE event_type = 'click' GROUP BY user_id
    """


def user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate_user analog (process.py:144-173): one user's activity grouped
    by a decoded JSON attribute (k mod 4 plays entityType)."""
    ev = load_events(spark, sf_dir)
    code = (jget_num("props", "$.k").cast("int") % 4).cast("string")
    decode = F.element_at(
        F.create_map(*[F.lit(x) for i, n in enumerate(ENTITY_NAMES) for x in (str(i), n)]),
        code,
    )
    return (
        ev.filter((F.col("user_id") == 7) & (F.col("event_type") == "view"))
        .groupBy(decode.alias("entity_type"))
        .agg(F.count(F.lit(1)).alias("user_count"))
    )


def user_activity_oracle() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{n}'" for i, n in enumerate(ENTITY_NAMES)
    )
    return f"""
    SELECT CASE (CAST(json_extract_string(props,'$.k') AS DOUBLE)::INT % 4) {cases} END AS entity_type,
           count(*) AS user_count
    FROM events
    WHERE user_id = 7 AND event_type = 'view'
    GROUP BY 1
    """


def user_energy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_energy analog (process.py:196-213): per-user LAG over the ordered
    stream, delta(value) / delta(ms); lag-before-filter order preserved."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    d_val = F.col("value") - F.lag("value", 1).over(w)
    d_ms = F.col("ts_ms") - F.lag("ts_ms", 1).over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("ts_ms").alias("timestamp_ms"),
            (F.sqrt(F.pow(d_val, F.lit(2))) / d_ms).alias("energy"),
            d_ms.alias("delta_ms"),
        )
        .filter(F.col("energy").isNotNull() & (F.col("delta_ms") > 0))
        .select("user_id", "event_id", "timestamp_ms", "energy")
    )


def user_energy_events_oracle() -> str:
    return """
    SELECT user_id, event_id, timestamp_ms, energy FROM (
      SELECT user_id, event_id, epoch_ms(ts) AS timestamp_ms,
             SQRT(POWER(value - LAG(value,1) OVER w, 2))
               / (epoch_ms(ts) - LAG(epoch_ms(ts),1) OVER w) AS energy,
             epoch_ms(ts) - LAG(epoch_ms(ts),1) OVER w AS delta_ms
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ) t WHERE energy IS NOT NULL AND delta_ms > 0
    """


def user_copresence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_proximity analog (process.py:413-448): seconds where >1 user is
    active (IN-subquery → semi join), then consecutive-row distance within
    the co-present bucket; range predicate on the distance.

    Scale note: the lag window partitions by the time bucket — unlike the
    reference's single global window, every bucket lags independently.
    """
    ev = load_events(spark, sf_dir).withColumn(
        "ts_sec", F.floor(F.col("ts_ms") / 1000)
    )
    copresent = (
        ev.groupBy("ts_sec")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .filter(F.col("n_users") > 1)
        .select("ts_sec")
    )
    rows = ev.join(copresent, "ts_sec", "left_semi")
    w = Window.partitionBy("ts_sec").orderBy("value", "event_id")
    distance = F.abs(F.col("value") - F.lag("value", 1).over(w))
    return (
        rows.select(
            "ts_sec",
            "user_id",
            "event_id",
            "value",
            distance.alias("distance"),
        )
        .filter((F.col("distance") > 0) & (F.col("distance") < 50.0))
    )


def user_copresence_oracle() -> str:
    return """
    SELECT ts_sec, user_id, event_id, value, distance FROM (
      SELECT ts_sec, user_id, event_id, value,
             ABS(value - LAG(value,1) OVER (PARTITION BY ts_sec ORDER BY value, event_id)) AS distance
      FROM (SELECT *, epoch_ms(ts) // 1000 AS ts_sec FROM events) e
      WHERE ts_sec IN (SELECT ts_sec FROM (SELECT epoch_ms(ts) // 1000 AS ts_sec, user_id FROM events) g
                       GROUP BY ts_sec HAVING count(DISTINCT user_id) > 1)
    ) t WHERE distance > 0 AND distance < 50.0
    """


def event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drawing_pattern analog (process.py:386-402): NULL-skipping count of a
    JSON path per group — count('$.k') counts present keys, count('$.missing')
    demonstrates path-miss skipping (0 everywhere)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(jget("props", "$.k")).alias("k_count"),
        F.count(jget("props", "$.missing")).alias("missing_count"),
        F.count(F.lit(1)).alias("row_count"),
    )


def event_pattern_oracle() -> str:
    return """
    SELECT event_type,
           count(json_extract_string(props,'$.k')) AS k_count,
           count(json_extract_string(props,'$.missing')) AS missing_count,
           count(*) AS row_count
    FROM events GROUP BY event_type
    """


def copresence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB alternative to user_copresence's window
    formulation (SURVEY.md §2.3): an explicit self-equi-join on the time
    bucket with a pairwise distance θ-filter.

    The window variant computes consecutive-row distances only (exactly the
    reference semantics); this variant computes ALL cross-user pairs in the
    bucket — the shape you actually want for proximity detection, and the
    scalable plan: equi-join on ts_sec hash-partitions both sides, the
    distance predicate is a cheap residual, and no global sort exists
    anywhere. Skewed buckets (a second where everyone is present) are
    handled by AQE skew-join splitting.
    """
    ev = load_events(spark, sf_dir).select(
        F.floor(F.col("ts_ms") / 1000).alias("ts_sec"),
        "event_id",
        "user_id",
        "value",
    )
    a, b = ev.alias("a"), ev.alias("b")
    dist = F.abs(F.col("a.value") - F.col("b.value"))
    return (
        a.join(b, "ts_sec")
        .filter(
            (F.col("a.user_id") != F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
        )
        .select(
            "ts_sec",
            F.col("a.event_id").alias("event_i"),
            F.col("b.event_id").alias("event_j"),
            F.col("a.user_id").alias("user_i"),
            F.col("b.user_id").alias("user_j"),
            dist.alias("distance"),
        )
        .filter((F.col("distance") > 0) & (F.col("distance") < 50.0))
    )


def copresence_pairs_oracle() -> str:
    return """
    WITH e AS (
      SELECT epoch_ms(ts) // 1000 AS ts_sec, event_id, user_id, value
      FROM events
    )
    SELECT a.ts_sec, a.event_id AS event_i, b.event_id AS event_j,
           a.user_id AS user_i, b.user_id AS user_j,
           ABS(a.value - b.value) AS distance
    FROM e a JOIN e b
      ON a.ts_sec = b.ts_sec
     AND a.user_id <> b.user_id
     AND a.event_id < b.event_id
    WHERE ABS(a.value - b.value) > 0 AND ABS(a.value - b.value) < 50.0
    """


def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style state history from the event log: collapse each user's
    event stream into contiguous runs of the same event_type, with
    valid_from/valid_to millis (valid_to = next run's start; NULL for the
    open current run) and the run's event count.

    Gaps-and-islands via one window pass: run boundaries where the type
    changes (lag comparison), run ids as a running sum of boundaries, then
    one aggregate per (user, run) and a lead() for the closing timestamp.
    Everything shuffles once on user_id; the windows and the aggregate reuse
    the same partitioning. This is the immutable-log replacement for the
    reference's in-place UPDATE state handling (process.py:171-176 decodes
    state by mutating rows; here history is derived, never mutated).
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.select("user_id", "event_id", "ts", "ts_ms", "event_type")
        .withColumn(
            "is_new",
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    per_run = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts_ms").alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return per_run.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from_ms",
        F.lead("valid_from_ms").over(w2).alias("valid_to_ms"),
        "n_events",
    )


def user_state_history_oracle() -> str:
    return """
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms, event_type
      FROM events
    ), marked AS (
      SELECT *,
        CASE WHEN lag(event_type) OVER w IS NULL
               OR lag(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING
      ) AS run_id
      FROM marked
    ), per_run AS (
      SELECT user_id, run_id, event_type AS state,
             MIN(ts_ms) AS valid_from_ms, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, state, valid_from_ms,
           lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to_ms,
           n_events
    FROM per_run
    """


# --------------------------------------------------------------------------
# funnel conversion (ordered step matching)
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user converts step k only
    with an event strictly AFTER their step-k-1 time (the standard funnel
    semantics, not mere per-type existence). Output: one row per step with
    users reaching it and conversion vs step 1.

    Scale design: ONE shuffle total. A single groupBy(user_id) gathers the
    first-step min plus the later steps' timestamp lists (conditional
    collect_list — per-user lists, bounded by a user's own event count);
    the strictly-after chaining is then per-row array algebra
    (array_min(filter(ts > prev))) inside codegen, and the rollup to 3 rows
    is a partial-aggregated count. The join-chain formulation (one
    aggregate + join per step, re-keyed on user_id each time) measured 16
    shuffles in the executed plan; this is 2.
    """
    ev = (
        load_events(spark, sf_dir)
        .select("user_id", "event_type", "ts_ms")
        # only the funnel's types matter: IN-filter pushes to the parquet scan
        .filter(F.col("event_type").isin(*_FUNNEL_STEPS))
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == _FUNNEL_STEPS[0], F.col("ts_ms"))
        ).alias("t1"),
        *[
            F.collect_list(
                F.when(F.col("event_type") == step, F.col("ts_ms"))
            ).alias(f"ts_{step}")
            for step in _FUNNEL_STEPS[1:]
        ],
    )
    prev = F.col("t1")
    step_times = [F.col("t1")]
    for step in _FUNNEL_STEPS[1:]:
        cur = F.array_min(F.filter(f"ts_{step}", lambda c: c > prev))
        step_times.append(cur)
        prev = cur
    reached = per_user.select(
        *[t.isNotNull().cast("long").alias(f"r{i}") for i, t in enumerate(step_times)]
    )
    totals = reached.agg(
        *[F.sum(f"r{i}").alias(f"n{i}") for i in range(len(_FUNNEL_STEPS))]
    )
    steps = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("event_type"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, name in enumerate(_FUNNEL_STEPS)
        ]
    )
    return (
        totals.select(F.explode(steps).alias("s"), F.col("n0").alias("base"))
        .select(
            "s.step",
            "s.event_type",
            "s.n_users",
            (F.col("s.n_users").cast("double") / F.col("base")).alias("conversion"),
        )
        .orderBy("step")
    )


def funnel_conversion_oracle() -> str:
    return """
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
    ),
    s1 AS (SELECT user_id, min(ts_ms) AS t FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts_ms) AS t FROM e
           JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts_ms > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts_ms) AS t FROM e
           JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t GROUP BY e.user_id),
    steps AS (
      SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    )
    SELECT step, event_type, n_users,
           n_users::DOUBLE / (SELECT count(*) FROM s1) AS conversion
    FROM steps ORDER BY step
    """


# --------------------------------------------------------------------------
# retention cohorts
# --------------------------------------------------------------------------

_WEEK_MS = 7 * 24 * 3600 * 1000


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-activity week
    (cohort), counted distinct in each later week, reported as
    (cohort_week, offset_weeks, n_active, retention vs cohort size).

    Scale design: both inputs aggregate on user_id first (cohort via min,
    activity via distinct (user, week) — the distinct is the dedup, so the
    big join carries one row per user-week, not per event). Join keyed on
    user_id reuses the aggregation partitioning; the rollup output is
    O(weeks^2) rows.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", (F.expr(f"ts_ms div {_WEEK_MS}")).alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    grid = (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("offset_weeks"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        grid.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "offset_weeks",
            "n_active",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "offset_weeks")
    )


def retention_cohorts_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) // {_WEEK_MS} AS week FROM events
    ),
    first AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, week FROM e),
    grid AS (
      SELECT f.cohort_week, a.week - f.cohort_week AS offset_weeks,
             count(*) AS n_active
      FROM active a JOIN first f ON f.user_id = a.user_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY 1)
    SELECT g.cohort_week, g.offset_weeks, g.n_active,
           g.n_active::DOUBLE / s.cohort_size AS retention
    FROM grid g JOIN sizes s ON s.cohort_week = g.cohort_week
    ORDER BY g.cohort_week, g.offset_weeks
    """


# --------------------------------------------------------------------------
# fixed-width value histogram
# --------------------------------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 100.0, 20


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per event_type: 20 bins over
    [0, 100), out-of-range values clamped into the edge bins. Single
    aggregate keyed by (event_type, bin) — fully map-side combinable; bin
    edges are constants so the whole thing is one shuffle of at most
    types × bins rows. (Equi-depth binning needs a quantile pass first —
    see sources/layout.py for that pattern.)
    """
    width = (_HIST_HI - _HIST_LO) / _HIST_BINS
    ev = load_events(spark, sf_dir)
    bin_id = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(width)), F.lit(0)
        ),
        F.lit(_HIST_BINS - 1),
    )
    return (
        ev.groupBy("event_type", bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("bin_min"),
            F.max("value").alias("bin_max"),
        )
        .orderBy("event_type", "bin")
    )


def events_value_histogram_oracle() -> str:
    width = (_HIST_HI - _HIST_LO) / _HIST_BINS
    return f"""
    SELECT event_type,
      least(greatest(floor((value - {_HIST_LO}) / {width}), 0),
            {_HIST_BINS - 1})::BIGINT AS bin,
      count(*) AS n, min(value) AS bin_min, max(value) AS bin_max
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """


# --------------------------------------------------------------------------
# population-stability-index drift (per-day value distribution vs corpus)
# --------------------------------------------------------------------------

#: PSI bins reuse the histogram range; 0.5/bin additive smoothing keeps
#: ln() finite for bins empty on either side.
_PSI_BINS = 10
_PSI_SMOOTH = 0.5


def events_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each day's value distribution against
    the whole corpus, per event_type — the standard "did the input
    distribution move" monitor a training-data pipeline runs on every
    ingest batch (PSI > 0.2 is the conventional retrain/investigate
    trigger).

    Shape at 100 TB: ONE aggregate over events keyed by (type, day, bin)
    — map-side combinable, fixed-width bins so no quantile pass — then all
    remaining arithmetic happens on types × days × bins rows (KBs). The
    corpus reference distribution derives from the same aggregate by a
    second tiny rollup. Day is the integer epoch-day (ts_ms div 86400000)
    — timezone-free, exact on both engines. The dense-spine + smoothing +
    PSI arithmetic is streaming/drift.psi_of — ONE code path with the
    per-micro-batch monitor, so stream and batch cannot drift apart.
    """
    from komodo_data_spark.streaming.drift import bin_col, psi_of

    ev = load_events(spark, sf_dir).select(
        F.expr("ts_ms div 86400000").alias("day"),
        "event_type",
        bin_col().alias("bin"),
    )
    day_bins = ev.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    corpus = day_bins.groupBy("event_type", "bin").agg(
        F.sum("n").alias("n_ref")
    )
    return psi_of(day_bins, corpus, ["event_type", "day"]).orderBy(
        "event_type", "day"
    )


def events_value_psi_drift_oracle() -> str:
    width = (_HIST_HI - _HIST_LO) / _PSI_BINS
    return f"""
    WITH binned AS (
      SELECT epoch_ms(ts) // 86400000 AS day, event_type,
             least(greatest(floor((value - {_HIST_LO}) / {width}), 0),
                   {_PSI_BINS - 1})::BIGINT AS bin
      FROM events
    ),
    day_bins AS (
      SELECT event_type, day, bin, count(*) AS n
      FROM binned GROUP BY 1, 2, 3
    ),
    spine AS (
      SELECT DISTINCT event_type, day, gs.range AS bin
      FROM day_bins, range(0, {_PSI_BINS}) gs
    ),
    dense AS (
      SELECT s.event_type, s.day, s.bin, coalesce(db.n, 0) AS n
      FROM spine s LEFT JOIN day_bins db
        ON db.event_type = s.event_type AND db.day = s.day AND db.bin = s.bin
    ),
    corpus AS (
      SELECT event_type, bin, sum(n) AS n_all
      FROM day_bins GROUP BY 1, 2
    ),
    terms AS (
      SELECT d.event_type, d.day, d.bin, d.n,
             coalesce(c.n_all, 0) AS n_all,
             sum(d.n) OVER (PARTITION BY d.event_type, d.day) AS day_total,
             sum(coalesce(c.n_all, 0)) OVER (
               PARTITION BY d.event_type, d.day) AS all_total
      FROM dense d LEFT JOIN corpus c
        ON c.event_type = d.event_type AND c.bin = d.bin
    )
    SELECT event_type, day,
           sum(((n + {_PSI_SMOOTH}) / (day_total + {_PSI_SMOOTH * _PSI_BINS})
                - (n_all + {_PSI_SMOOTH}) / (all_total + {_PSI_SMOOTH * _PSI_BINS}))
               * ln(((n + {_PSI_SMOOTH}) / (day_total + {_PSI_SMOOTH * _PSI_BINS}))
                    / ((n_all + {_PSI_SMOOTH}) / (all_total + {_PSI_SMOOTH * _PSI_BINS})))
              ) AS psi,
           sum(n)::BIGINT AS n_events
    FROM terms
    GROUP BY event_type, day
    ORDER BY event_type, day
    """


# --------------------------------------------------------------------------
# z-score anomaly detection
# --------------------------------------------------------------------------

_ZSCORE_CUT = 2.5


def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 2.5 sample standard deviations from their
    event_type's mean. Two narrow aggregates: per-type mean/std (types ×
    1 rows, broadcast back), then a scan-side filter — the anomaly scan is
    one pass, no shuffle of event rows. At 100 TB the stats frame is a few
    rows regardless of data size.
    """
    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", (F.col("value") - F.col("mu")) / F.col("sigma"))
        .filter(F.abs("zscore") > _ZSCORE_CUT)
        .select("event_id", "event_type", "value", "zscore")
    )


def events_value_anomalies_oracle() -> str:
    return f"""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.mu) / s.sigma AS zscore
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > {_ZSCORE_CUT}
    """


# --------------------------------------------------------------------------
# Variant-typed semi-structured access (Spark 4)
# --------------------------------------------------------------------------


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over a JSON property, extracted through Spark 4's
    VARIANT type (``parse_json`` -> ``variant_get``) instead of per-access
    string parsing. At 100 TB the difference is structural: a VARIANT
    column parses each JSON once into a shredded binary encoding that
    later extractions (and, with Parquet variant shredding, the scan
    itself) navigate without re-tokenizing, whereas ``get_json_object``
    re-parses the string at every call site. The aggregate itself is one
    map-side-combinable shuffle of types x 1 rows.
    """
    ev = load_events(spark, sf_dir)
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("k")).alias("n_distinct_k"),
            F.avg("k").alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def events_props_variant_oracle() -> str:
    return """
    SELECT event_type, count(*) AS n,
           count(DISTINCT (props::JSON->>'k')::INTEGER) AS n_distinct_k,
           avg((props::JSON->>'k')::INTEGER) AS avg_k,
           min((props::JSON->>'k')::INTEGER) AS min_k,
           max((props::JSON->>'k')::INTEGER) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """


# --------------------------------------------------------------------------
# full-outer reconciliation (segment users by click vs purchase presence)
# --------------------------------------------------------------------------


def user_click_purchase_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two per-user rollups with a FULL OUTER join: users who
    click vs users who purchase, segmented both/click_only/purchase_only —
    the audit-join shape (unmatched rows from BOTH sides must survive).

    Scale: both inputs pre-aggregate to one row per user before the join,
    so the full-outer carries |users| rows per side, not |events|; both
    sides arrive hash-partitioned on user_id from their aggregates, so the
    join adds no extra exchange.
    """
    ev = load_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    seg = (
        F.when(F.col("n_clicks").isNotNull() & F.col("n_purchases").isNotNull(), "both")
        .when(F.col("n_clicks").isNotNull(), "click_only")
        .otherwise("purchase_only")
    )
    return (
        clicks.join(purchases, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            seg.alias("segment"),
        )
        .orderBy("user_id")
    )


def user_click_purchase_reconcile_oracle() -> str:
    return """
    WITH c AS (
      SELECT user_id, count(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT user_id, count(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.n_clicks, 0) AS n_clicks,
           coalesce(p.n_purchases, 0) AS n_purchases,
           CASE WHEN c.user_id IS NOT NULL AND p.user_id IS NOT NULL THEN 'both'
                WHEN c.user_id IS NOT NULL THEN 'click_only'
                ELSE 'purchase_only' END AS segment
    FROM c FULL OUTER JOIN p ON p.user_id = c.user_id
    ORDER BY user_id
    """


# --------------------------------------------------------------------------
# grouped-map applyInPandas: per-user OLS trend
# --------------------------------------------------------------------------


def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of value over time (OLS slope + intercept,
    x = hours since the user's first event) via grouped-map
    ``applyInPandas`` — the surface for per-key model fitting that SQL
    aggregates can't express (here OLS CAN be — the oracle uses
    regr_slope — which is exactly what makes it verifiable end-to-end).

    Scale: grouping on raw user_id costs one Python call per user — tiny
    groups make per-call overhead the bottleneck (measured 4 s for 1.5k
    users / 100k events). The grouped-map key is a HASH BUCKET of the user
    (fixed fan-out, one Arrow batch per bucket) and the closed-form OLS is
    evaluated for ALL users in the batch with vectorized groupby
    transforms — same per-user model, group count independent of the user
    population. Skew stays bounded: a bucket holds ~|users|/32 keys.
    """
    import pandas as pd

    n_buckets = 32
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "ts_ms",
        "value",
        F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("bucket"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["user_id"]
        x = (pdf["ts_ms"] - pdf.groupby("user_id")["ts_ms"].transform("min")) / 3_600_000.0
        y = pdf["value"]
        xc = x - x.groupby(u).transform("mean")
        yc = y - y.groupby(u).transform("mean")
        per = pd.DataFrame(
            {"user_id": u, "sxx": xc * xc, "sxy": xc * yc, "x": x, "y": y}
        ).groupby("user_id", as_index=False).agg(
            n_events=("x", "size"),
            sxx=("sxx", "sum"),
            sxy=("sxy", "sum"),
            xmean=("x", "mean"),
            ymean=("y", "mean"),
        )
        ok = (per["n_events"] >= 2) & (per["sxx"] != 0.0)
        slope = (per["sxy"] / per["sxx"]).where(ok)
        return pd.DataFrame(
            {
                "user_id": per["user_id"],
                "n_events": per["n_events"],
                "slope_per_hour": slope,
                "intercept": (per["ymean"] - slope * per["xmean"]).where(ok),
            }
        )

    return ev.groupBy("bucket").applyInPandas(
        fit,
        schema="user_id long, n_events long, slope_per_hour double, intercept double",
    )


def events_user_trend_oracle() -> str:
    return """
    WITH e AS (
      SELECT user_id, value, epoch_ms(ts) AS ts_ms,
             min(epoch_ms(ts)) OVER (PARTITION BY user_id) AS min_ts
      FROM events
    ), x AS (
      SELECT user_id, value, (ts_ms - min_ts) / 3600000.0 AS xh FROM e
    )
    SELECT user_id, count(*) AS n_events,
           regr_slope(value, xh) AS slope_per_hour,
           regr_intercept(value, xh) AS intercept
    FROM x GROUP BY user_id
    """


# --------------------------------------------------------------------------
# mergeable distinct sketches (HLL build -> persist -> union -> estimate)
# --------------------------------------------------------------------------


def events_distinct_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via PERSISTABLE DataSketches HLL:
    build one sketch per (event_type, day), then union the daily sketches
    and estimate — the incremental-analytics pattern where yesterday's
    sketches are stored bytes and today's scan only touches today.

    The daily pre-aggregate stands in for the stored sketch table;
    ``hll_union_agg`` proves the merge path. Rows-only check (sketch
    estimates are library-specific); the oracle-checked exact twin is
    ``supplier_part_distinct_exact`` / the n_exact column cross-checked in
    tests. Error bound: lgK=12 → ~1.6% RSE.
    """
    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.expr("ts_ms div 86400000").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct_users"
            ),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .orderBy("event_type")
    )


def events_value_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quartiles) of event values: one exact
    percentile aggregate produces the 3 quartile boundaries, broadcast
    back as a 1-row frame, and a second pass buckets by comparison — no
    global sort, no single-task window (the percent_rank formulation
    would funnel every row through one partition; see sources/layout.py
    for the same pattern used at write time). At extreme scale swap the
    exact percentile for approx_percentile — same plan, bounded memory.
    """
    ev = load_events(spark, sf_dir).select("value")
    bounds = ev.agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("q")
    )
    b = ev.crossJoin(F.broadcast(bounds))
    bucket = (
        F.when(F.col("value") <= F.col("q")[0], "q1")
        .when(F.col("value") <= F.col("q")[1], "q2")
        .when(F.col("value") <= F.col("q")[2], "q3")
        .otherwise("q4")
    )
    return (
        b.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


def events_value_histogram_equidepth_oracle() -> str:
    return """
    WITH q AS (
      SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.5) AS q2,
             quantile_cont(value, 0.75) AS q3
      FROM events
    )
    SELECT CASE WHEN value <= q.q1 THEN 'q1'
                WHEN value <= q.q2 THEN 'q2'
                WHEN value <= q.q3 THEN 'q3'
                ELSE 'q4' END AS bucket,
           count(*) AS n, min(value) AS lo, max(value) AS hi
    FROM events, q
    GROUP BY 1 ORDER BY 1
    """


# --------------------------------------------------------------------------
# event-sequence transition matrix (first-order Markov estimate)
# --------------------------------------------------------------------------


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts/probabilities between consecutive
    event types per user — the Markov-chain estimate behind next-action
    prediction and anomalous-sequence detection.

    Plan: one per-user lag window (shuffle on user_id — co-partitioned
    with sessionization/funnel ops so a pipeline running several
    sequence analyses reuses the exchange), then a |types|² aggregate.
    The row probability divides by the per-prev-type total via a window
    AFTER the collapse (the percent-of-total lesson: the window runs over
    the tiny matrix, never the event stream).
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    t = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    share = Window.partitionBy("prev_type")
    return t.withColumn(
        "p_next",
        F.col("n_transitions") / F.sum("n_transitions").over(share),
    )


def events_transition_matrix_oracle() -> str:
    return """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id) AS prev_type
      FROM events
    ),
    m AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_transitions,
           n_transitions / (sum(n_transitions) OVER (PARTITION BY prev_type))
             AS p_next
    FROM m
    """


# --------------------------------------------------------------------------
# inter-arrival time statistics
# --------------------------------------------------------------------------


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics (median / p90 / max of the
    per-user gap in ms) — the cadence profile behind rate limiting, bot
    detection, and session-gap threshold selection (the 30-min gap used by
    the sessionization ops should come FROM this distribution, not
    folklore).

    One per-user lag window (co-partitioned with every other sequence op),
    then exact percentiles per event type — |types| groups, so the
    percentile buffers are bounded; at higher group cardinality swap in
    approx_percentile (cf. corpus.event_value_percentiles).
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts_ms").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select("event_type", (F.col("ts_ms") - F.col("prev_ts")).alias("gap_ms"))
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile(gap_ms, 0.5)").alias("median_gap_ms"),
        F.expr("percentile(gap_ms, 0.9)").alias("p90_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
    )


def events_interarrival_stats_oracle() -> str:
    return """
    WITH gaps AS (
      SELECT event_type,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ) AS gap_ms
      FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           quantile_cont(gap_ms, 0.5) AS median_gap_ms,
           quantile_cont(gap_ms, 0.9) AS p90_gap_ms,
           max(gap_ms) AS max_gap_ms
    FROM gaps WHERE gap_ms IS NOT NULL
    GROUP BY event_type
    """


# --------------------------------------------------------------------------
# cross-type activity correlation
# --------------------------------------------------------------------------


def events_type_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between the hourly activity series of every
    event-type pair — "do purchases move with clicks?" — the co-movement
    matrix behind anomaly attribution and metric forecasting.

    Shape: one hourly (hour, type) count aggregate, a self equi-join on
    the hour key (series align on time, never a cross join), then the
    corr() aggregate per unordered type pair. Series length ~ hours, pair
    count ~ |types|², both tiny next to the event scan; the only
    corpus-scale work is the first aggregate, which is map-side
    combinable. Missing (hour, type) cells count as zero activity via the
    dense hour spine, so sparse types don't fake correlation through
    join dropout.
    """
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.expr("ts_ms div 3600000").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    hours = hourly.select("hour").distinct()
    types = hourly.select("event_type").distinct()
    dense = (
        hours.crossJoin(types)  # |hours| x |types|: spine, not data
        .join(hourly, ["hour", "event_type"], "left")
        .select("hour", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    a = dense.select(
        "hour", F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    b = dense.select(
        "hour", F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    # both sides are |hours|x|types| rows (time-bounded, NOT corpus-bound):
    # broadcast the build side rather than letting stats pick a sort-merge
    return (
        a.join(F.broadcast(b), "hour")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.corr("n_a", "n_b").alias("activity_corr"),
        )
    )


def events_type_correlations_oracle() -> str:
    return """
    WITH hourly AS (
      SELECT epoch_ms(ts) // 3600000 AS hour, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    dense AS (
      SELECT h.hour, t.event_type, coalesce(hr.n, 0) AS n
      FROM (SELECT DISTINCT hour FROM hourly) h
      CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
      LEFT JOIN hourly hr ON hr.hour = h.hour AND hr.event_type = t.event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_hours, corr(a.n, b.n) AS activity_corr
    FROM dense a JOIN dense b ON a.hour = b.hour
    WHERE a.event_type < b.event_type
    GROUP BY type_a, type_b
    """


# --------------------------------------------------------------------------
# event-time disorder audit (watermark tuning)
# --------------------------------------------------------------------------


def events_disorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type out-of-orderness audit: how far behind the per-user
    event-time high-water mark does each event arrive? ``event_id`` is the
    ingestion sequence (monotone assignment order), so
    ``lateness_ms = running_max(ts_ms) over arrival order - ts_ms`` is
    exactly the quantity a streaming watermark must cover — the
    ``withWatermark`` delays used by streaming/windows.py should come FROM
    this distribution (p95/max per type), the same way the 30-min session
    gap comes from events_interarrival_stats, not folklore.

    Scale: one per-user running-max window (hash-partition on user_id +
    local sort — co-partitioned with every other per-user sequence op),
    then a |types|-group aggregate with exact percentiles over bounded
    buffers; swap in approx_percentile past ~1e8 rows per type.
    """
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.select(
        "event_type",
        (F.max("ts_ms").over(w) - F.col("ts_ms")).alias("lateness_ms"),
    )
    is_late = (F.col("lateness_ms") > 0).cast("int")
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_late).cast("long").alias("n_late"),
        F.avg(is_late.cast("double")).alias("late_frac"),
        F.expr("percentile(lateness_ms, 0.5)").alias("median_late_ms"),
        F.expr("percentile(lateness_ms, 0.95)").alias("p95_late_ms"),
        F.max("lateness_ms").alias("max_late_ms"),
    )


def events_disorder_stats_oracle() -> str:
    return """
    WITH l AS (
      SELECT event_type,
             max(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - epoch_ms(ts) AS lateness_ms
      FROM events
    )
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CASE WHEN lateness_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           avg(CASE WHEN lateness_ms > 0 THEN 1.0E0 ELSE 0.0E0 END)
             AS late_frac,
           quantile_cont(lateness_ms, 0.5) AS median_late_ms,
           quantile_cont(lateness_ms, 0.95) AS p95_late_ms,
           max(lateness_ms) AS max_late_ms
    FROM l GROUP BY event_type
    """


# --------------------------------------------------------------------------
# audience overlap between event types
# --------------------------------------------------------------------------


def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap for every event-type pair: how many users are
    active in BOTH types, and the Jaccard of the two user sets — the
    "do buyers also browse?" matrix behind segmentation and the exact
    ground truth an HLL-sketch intersection would approximate.

    Shape chosen for scale: NO self-join of the (type, user) long form —
    on a skewed corpus the hot user_id would square. Instead ONE shuffle
    builds the per-user distinct type set (collect_set, bounded by
    |types|, map-side combined), each user expands to their unordered
    type pairs with a nested higher-order transform (<= |types|²/2 structs
    per user, codegen), and a |types|²-key aggregate counts co-active
    users. Per-type totals reuse the same per-user sets; the final joins
    broadcast |types|-row frames. A pair appears iff at least one user
    has both types — identical emptiness rule in the oracle join.
    """
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    pairs = per_user.select(
        F.explode(
            F.expr(
                """
                flatten(transform(types, (a, i) ->
                  transform(slice(types, i + 2, size(types) - i - 1),
                    b -> struct(a AS type_a, b AS type_b))))
                """
            )
        ).alias("p")
    ).select("p.*")
    inter = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_both")
    )
    totals = per_user.select(
        F.explode("types").alias("event_type")
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ta = totals.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


def events_audience_overlap_oracle() -> str:
    return """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    tot AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, na.n AS n_a, nb.n AS n_b, i.n_both,
           i.n_both::DOUBLE / (na.n + nb.n - i.n_both) AS jaccard
    FROM inter i
    JOIN tot na ON na.event_type = i.type_a
    JOIN tot nb ON nb.event_type = i.type_b
    """


def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomalies: an event is flagged when its value
    deviates > _ZSCORE_CUT standard deviations from the mean of its OWN
    (event_type, hour-of-day) cell — the seasonal upgrade of
    ``events_value_anomalies``, which scores against the type-global
    mean and therefore flags every ordinary nightly peak while missing a
    genuinely-anomalous value that hides inside the global band but sits
    far outside its hour's band. The classic telemetry-monitoring move:
    the baseline absorbs the diurnal cycle, the residual carries the
    signal.

    Scale design: identical to the global variant — one
    map-side-combinable aggregate to a (types × 24)-row baseline frame,
    broadcast back onto the scan, flag in a single pass; no event rows
    ever shuffle. Hour-of-day is pure integer epoch math ((ts_ms div
    3600000) mod 24 — no timezone functions), identical on both engines.
    """
    ev = load_events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "value",
        # true integer division (div), not double-divide-then-truncate:
        # the docstring/oracle promise `//` semantics and double quotients
        # get ulp-fragile at finer resolutions
        (F.expr("(ts_ms div 3600000) % 24")).alias("hod"),
    ).filter(F.col("value").isNotNull())
    stats = ev.groupBy("event_type", "hod").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        ev.join(F.broadcast(stats), ["event_type", "hod"])
        .withColumn("zscore", (F.col("value") - F.col("mu")) / F.col("sigma"))
        .filter(F.abs("zscore") > _ZSCORE_CUT)
        .select("event_id", "event_type", "hod", "value", "zscore")
    )


def events_seasonal_anomalies_oracle() -> str:
    return f"""
    WITH ev AS (
      SELECT event_id, event_type, value,
             (epoch_ms(ts) // 3600000) % 24 AS hod
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT event_type, hod, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM ev GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type, e.hod, e.value,
           (e.value - s.mu) / s.sigma AS zscore
    FROM ev e JOIN stats s ON s.event_type = e.event_type AND s.hod = e.hod
    WHERE abs((e.value - s.mu) / s.sigma) > {_ZSCORE_CUT}
    """
