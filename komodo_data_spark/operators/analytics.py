"""The reference's five analytics workloads as single-plan DataFrame functions.

Each function mirrors one MySQL workload from /root/reference/process.py but
is expressed as one declarative Spark plan: no staging tables, no in-place
UPDATEs, no double execution (the reference re-runs drawing_pattern and
user_proximity twice, process.py:399-402/:438-441 — eliminated here).

Scale design (100 TB): the `data` table is expected partitioned by
``session_id`` (see sources.capture.append_to_data_table), so every
``session_id = :x`` filter prunes partitions at scan time. Window functions
are partitioned on the same keys the reference's WHERE clause pins to
constants — identical results at any scale, no single-task global sorts
except where the reference's semantics genuinely are global (user_proximity
parity mode; a partitioned variant is provided for scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from komodo_data_spark.functions.json_compat import decode_entity, jget, jget_num


def aggregate_interaction_type(
    data: DataFrame, session_id: int, interaction_type: int
) -> DataFrame:
    """Interactions per client for one session + interaction type.

    Reference: process.py:79-88 (INSERT…SELECT into `aggregate_interaction`).
    ``count(message)`` is a non-NULL count of the message column — kept as-is.
    ``message->'$.interactionType' = :x`` coerces numerically in MySQL →
    double-cast compare here.
    """
    return (
        data.filter(
            (F.col("session_id") == F.lit(int(session_id)))
            & (jget_num("message", "$.interactionType") == F.lit(float(interaction_type)))
        )
        .groupBy("client_id")
        .agg(F.count("message").alias("interaction_count"))
    )


def aggregate_user(data: DataFrame, session_id: int, client_id: int) -> DataFrame:
    """Per-entity-type activity count for one client in one session.

    Reference: process.py:144-173 — aggregate into `aggregate_user`, then an
    in-place UPDATE decodes entity codes to names (process.py:159-164). Here
    the decode folds into the projection; output columns match the
    reference's final SELECT * : (entity_type, user_count).
    """
    return (
        data.filter(
            (jget_num("message", "$.clientId") == F.lit(float(client_id)))
            & (F.col("session_id") == F.lit(int(session_id)))
            & (F.col("type") == "sync")
        )
        .groupBy(jget("message", "$.entityType").alias("entity_type"))
        .agg(F.count(F.lit(1)).alias("user_count"))
        .select(decode_entity("entity_type").alias("entity_type"), "user_count")
    )


def user_energy(
    data: DataFrame,
    session_id: int,
    client_id: int,
    entity_type: int | str,
    partition_parity: bool = False,
) -> DataFrame:
    """Movement "energy" per sync message: √(Δx²+Δy²+Δz²) / Δts.

    Reference: process.py:196-213. Semantics preserved exactly:
    - LAG runs over the rows *after* the client/session/type filter, ordered
      by ``seq`` — i.e. deltas are taken across entity types interleaved in
      one client stream;
    - the ``entity_type = :x`` filter applies *after* the lag (outer WHERE,
      process.py:209), so it never changes which row is "previous";
    - ``entity_type`` is projected as the raw JSON text (``'0'``), numeric
      only in the predicate (MySQL coercion);
    - output: (client_id, session_id, timestamp, entity_type, energy),
      ORDER BY entity_type, energy DESC (process.py:198,210).

    Window partitioning: the reference's window is globally ordered, but its
    WHERE pins (session_id, clientId) to constants, so partitioning by those
    keys yields the identical frame while staying parallel at scale. Pass
    ``partition_parity=True`` to force the reference's literal single-task
    global window.
    """
    filtered = data.filter(
        (jget_num("message", "$.clientId") == F.lit(float(client_id)))
        & (F.col("session_id") == F.lit(int(session_id)))
        & (F.col("type") == "sync")
    )
    if partition_parity:
        w = Window.orderBy("seq")
    else:
        # session_id and the message clientId are constants under the filter;
        # partitioning by the physical stream keys gives the same frame.
        w = Window.partitionBy("session_id", "client_id").orderBy("seq")

    def delta(path: str):
        c = jget_num("message", path)
        return c - F.lag(c, 1).over(w)

    energy = F.sqrt(
        F.pow(delta("$.pos.x"), F.lit(2))
        + F.pow(delta("$.pos.y"), F.lit(2))
        + F.pow(delta("$.pos.z"), F.lit(2))
    ) / (F.col("ts") - F.lag("ts", 1).over(w))

    return (
        filtered.select(
            "client_id",
            "session_id",
            F.col("ts").alias("timestamp"),
            jget("message", "$.entityType").alias("entity_type"),
            energy.alias("energy"),
        )
        .filter(
            F.col("energy").isNotNull()
            & (F.col("entity_type").cast("double") == F.lit(float(entity_type)))
        )
        .orderBy("entity_type", F.desc("energy"))
    )


def drawing_pattern(data: DataFrame) -> DataFrame:
    """Stroke usage between timestamps.

    Reference: process.py:386-402. ``count(message->'$.strokeType')`` counts
    rows where the JSON path *exists* (non-NULL) — Spark's ``F.count`` over
    ``get_json_object`` has identical NULL-skipping semantics.
    Output: (timestamp, stroke_type_count, stroke_id_count) ORDER BY
    stroke_type_count DESC.
    """
    return (
        data.groupBy(F.col("ts").alias("timestamp"))
        .agg(
            F.count(jget("message", "$.strokeType")).alias("stroke_type_count"),
            F.count(jget("message", "$.strokeId")).alias("stroke_id_count"),
        )
        .orderBy(F.desc("stroke_type_count"))
    )


def user_proximity(
    data: DataFrame, diameter: float, scale_mode: bool = False
) -> DataFrame:
    """Moments when multiple users appear within ``diameter`` of each other.

    Reference: process.py:413-448. Faithful pipeline:
    1. co-present timestamps: ``ts IN (SELECT ts … HAVING count(distinct
       client_id) > 1)`` → left-semi join (process.py:427-430);
    2. pairwise "distance" via LAG over rows ordered by (ts, position-text)
       — consecutive-row distance, not a true all-pairs self-join
       (process.py:421-424);
    3. ``distance > 0 AND distance < :diameter`` then ORDER BY distance
       (process.py:433-434).

    Output: (ts, client_id, position, distance, capture_id, session_id).

    ``scale_mode=False`` (parity) uses the reference's *global* (ts,
    position) ordering — correct but a single-task window, fine at
    reference scale. ``scale_mode=True`` partitions the window by
    ``session_id``: at 100 TB each session's stream lags independently and
    in parallel. Distances never cross sessions in practice because co-present
    rows of one ts belong to one live session, but the first row of each
    session loses its (meaningless) cross-session lag pair — the documented
    deviation.
    """
    copresent_ts = (
        data.groupBy("ts")
        .agg(F.count_distinct("client_id").alias("n_clients"))
        .filter(F.col("n_clients") > 1)
        .select("ts")
    )

    rows = data.join(copresent_ts, "ts", "left_semi").select(
        "client_id",
        jget("message", "$.pos").alias("position"),
        "capture_id",
        "session_id",
        "ts",
        jget_num("message", "$.pos.x").alias("_x"),
        jget_num("message", "$.pos.y").alias("_y"),
        jget_num("message", "$.pos.z").alias("_z"),
    )

    if scale_mode:
        w = Window.partitionBy("session_id").orderBy("ts", "position")
    else:
        w = Window.orderBy("ts", "position")

    def d2(c: str):
        col = F.col(c)
        return F.pow(col - F.lag(col, 1).over(w), F.lit(2))

    distance = F.sqrt(d2("_x") + d2("_y") + d2("_z"))

    return (
        rows.select(
            "ts",
            "client_id",
            "position",
            distance.alias("distance"),
            "capture_id",
            "session_id",
        )
        .filter((F.col("distance") > 0) & (F.col("distance") < F.lit(float(diameter))))
        .orderBy("distance")
    )
