"""Aggregation-request dispatcher (the reference's work-queue consumer).

Reference: ``aggregation_file_download`` (process.py:320-366) selects pending
rows (``is_it_fulfilled = 0`` ordered by request_id), extracts the request
params from the row's own JSON ``message`` with ``->`` (so JSON nulls surface
as the text ``'null'``), string-dispatches on ``aggregation_function``, and
validates params against the literal string ``"null"`` before calling.

Rebuild: the queue scan is one DataFrame pass; each dispatched analytic is a
single Spark plan exported to CSV; fulfillment updates append to the control
status log. Unknown function names are ignored, failures isolate per-request —
both reference behaviors (process.py:339-366).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from komodo_data_spark.functions.json_compat import req_param
from komodo_data_spark.operators import analytics


def _as_int(param: str | None) -> int:
    """MySQL numeric coercion for request params: non-numeric text (incl. the
    ``'null'`` marker when it slips past a validity check, as session_id does
    in the reference's user_energy branch, process.py:362-366) coerces to 0 —
    the reference then runs the query, exports an empty CSV, and marks the
    request fulfilled. Exception-skipping here would be a parity deviation."""
    try:
        return int(float(param))
    except (TypeError, ValueError):
        return 0


def pending_requests(requests: DataFrame) -> DataFrame:
    """SELECT …, message->params FROM data_requests WHERE is_it_fulfilled=0
    ORDER BY request_id (process.py:323-330)."""
    return (
        requests.filter(F.col("is_it_fulfilled") == 0)
        .select(
            "request_id",
            "aggregation_function",
            "is_it_fulfilled",
            req_param("message", "clientId").alias("client_id"),
            req_param("message", "sessionId").alias("session_id"),
            req_param("message", "entityType").alias("entity_type"),
            req_param("message", "interactionType").alias("interaction_type"),
        )
        .orderBy("request_id")
    )


def export_csv(
    df: DataFrame, out_dir: str, prefix: str, filename: str | None = None
) -> str:
    """CSV result sink with the reference's timestamped filename
    (process.py:100-107; the '%Y-%m-%d %H-%S' format — minutes skipped —
    is preserved verbatim). ``filename`` overrides the timestamp for
    callers that need deterministic (replay-idempotent) names."""
    os.makedirs(out_dir, exist_ok=True)
    if filename is None:
        filename = f"{prefix}_{time.strftime('%Y-%m-%d %H-%S')}.csv"
    path = os.path.join(out_dir, filename)
    df.toPandas().to_csv(path, index=False)
    return os.path.abspath(path)


def aggregation_file_download(
    spark: SparkSession,
    requests: DataFrame,
    data: DataFrame,
    out_dir: str,
    on_fulfilled=None,
    deterministic_names: bool = False,
) -> list[tuple[int, str, str]]:
    """Process every pending request; returns [(request_id, function, csv_path)].

    ``on_fulfilled(request_id, path)`` is the seam for control-table updates
    (sources.control.update_data_request). With ``deterministic_names`` the
    CSV name is derived from the request_id instead of the wall clock, so a
    replayed batch overwrites its own files (used by the streaming path).
    """
    done: list[tuple[int, str, str]] = []

    def _name(prefix: str, rid: int) -> str | None:
        return f"{prefix}_req{rid}.csv" if deterministic_names else None

    rows = pending_requests(requests).collect()  # control-plane: tiny
    for row in rows:
        fn = row["aggregation_function"]
        rid = int(row["request_id"])
        client_id = row["client_id"]
        session_id = row["session_id"]
        entity_type = row["entity_type"]
        interaction_type = row["interaction_type"]
        try:
            if fn == "aggregate_interaction_type":
                if session_id != "null" and interaction_type != "null":
                    result = analytics.aggregate_interaction_type(
                        data, _as_int(session_id), _as_int(interaction_type)
                    )
                    path = export_csv(
                        result, out_dir, "aggregate_interaction",
                        filename=_name("aggregate_interaction", rid),
                    )
                else:
                    print("Argument(s) for aggregate_interaction not valid!")
                    continue
            elif fn == "aggregate_user":
                if client_id != "null" and session_id != "null":
                    result = analytics.aggregate_user(
                        data, _as_int(session_id), _as_int(client_id)
                    )
                    path = export_csv(
                        result, out_dir, "aggregate_user",
                        filename=_name("aggregate_user", rid),
                    )
                else:
                    print("Argument(s) for aggregate_user not valid!")
                    continue
            elif fn == "user_energy":
                if entity_type != "null" and client_id != "null":
                    result = analytics.user_energy(
                        data,
                        _as_int(session_id),
                        _as_int(client_id),
                        entity_type,
                    )
                    path = export_csv(
                        result, out_dir, "user_energy",
                        filename=_name("user_energy", rid),
                    )
                else:
                    print("Argument(s) for user_energy not valid!")
                    continue
            else:  # unknown function names fall through silently (process.py:351-366)
                continue
        except Exception as e:  # per-request failure isolation
            print(f"request {rid} ({fn}) failed: {e}")
            continue
        done.append((rid, fn, path))
        if on_fulfilled is not None:
            on_fulfilled(rid, path)
    return done


# --------------------------------------------------------------------------
# streaming request queue (file-arrival -> dispatch via foreachBatch)
# --------------------------------------------------------------------------


def start_request_stream(
    spark: SparkSession,
    requests_glob: str,
    data: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    on_fulfilled=None,
    available_now: bool = True,
):
    """The reference's request-polling loop (process.py:450-473, 10 s
    sleep over ``data_requests``) as a stream: request rows arrive as
    JSON-lines files, each micro-batch dispatches them through the SAME
    batch dispatcher (``aggregation_file_download``) inside foreachBatch —
    the ``is_it_fulfilled`` flag polling becomes unnecessary exactly the
    way ``captures.processed`` did for ingest (streaming/ingest.py).

    Delivery semantics: source offsets are exactly-once (the checkpoint
    never re-reads a committed file), but foreachBatch side effects are
    AT-LEAST-ONCE — a crash between dispatch and checkpoint commit replays
    the batch. Both side effects are therefore idempotent under replay:
    CSV names are derived from the request_id (``deterministic_names``), so
    a replay overwrites the same files, and ``on_fulfilled`` feeds the
    latest-wins control log (sources.control), where a duplicate
    fulfillment row collapses to the same state.

    Scale note: the queue is control-plane (tiny); the heavy side is
    ``data``, a plain batch frame re-used across batches — foreachBatch is
    what allows mixing a static 100 TB table with a streaming queue.
    """
    from komodo_data_spark.schemas import DATA_REQUESTS_SCHEMA

    stream = (
        spark.readStream.schema(DATA_REQUESTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(requests_glob)
    )

    def dispatch_batch(batch_df: DataFrame, _epoch: int) -> None:
        aggregation_file_download(
            spark, batch_df, data, out_dir, on_fulfilled=on_fulfilled,
            deterministic_names=True,
        )

    writer = (
        stream.writeStream.foreachBatch(dispatch_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
