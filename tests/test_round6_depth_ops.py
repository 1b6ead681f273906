"""Hand-computed pins for the round-6 depth ops: order-preserving session
transcript assembly, event-time disorder (watermark-tuning) stats, and
per-label centroid cosine. Each test builds a tiny parquet table whose
answer is computable by hand, so the semantics are pinned independently of
the DuckDB oracle pairing in scripts/check.py."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows, name="ev_sf"):
    ns = 1_000_000  # ms -> ns
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * ns for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


def test_session_transcripts_order_and_breaks(spark, tmp_path):
    """Transcript order is (ts, event_id) — same-ts ties break by event_id —
    and a >30-min gap starts a new session; collect order (partitioning,
    merge order) cannot leak into the transcript because array_sort imposes
    the total order inside the aggregate."""
    from komodo_data_spark.operators.sessions import (
        SESSION_GAP_MS,
        events_session_transcripts,
    )

    rows = [
        # user 1, session 0: same-ts tie (ids 1,2) then a later event
        (1, 1000, 1, "view"),
        (2, 1000, 1, "click"),
        (3, 2000, 1, "view"),
        # user 1, session 1: gap just over the threshold
        (4, 2000 + SESSION_GAP_MS + 1, 1, "purchase"),
        # user 2: single-event session
        (5, 500, 2, "view"),
    ]
    d = _write_events(tmp_path, rows, "transcripts_sf")
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in events_session_transcripts(spark, d).collect()
    }
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    s10 = got[(1, 0)]
    assert s10["transcript"] == "view>click>view"
    assert s10["n_turns"] == 3
    assert s10["n_types"] == 2
    assert s10["start_ms"] == 1000
    assert s10["duration_ms"] == 1000
    assert got[(1, 1)]["transcript"] == "purchase"
    assert got[(1, 1)]["n_turns"] == 1
    assert got[(2, 0)]["transcript"] == "view"


def test_disorder_stats_lateness_vs_running_max(spark, tmp_path):
    """Lateness is measured against the running event-time max in ARRIVAL
    (event_id) order: an event whose ts sits behind an already-seen later
    ts is late by exactly the difference; in-order events are 0-late."""
    from komodo_data_spark.operators.events_analytics import (
        events_disorder_stats,
    )

    rows = [
        # user 1 arrival order: 1000, 3000, 2000 (late by 1000), 5000
        (1, 1000, 1, "view"),
        (2, 3000, 1, "view"),
        (3, 2000, 1, "view"),
        (4, 5000, 1, "view"),
        # user 2 resets the running max: its 100 is NOT late
        (5, 100, 2, "view"),
    ]
    d = _write_events(tmp_path, rows, "disorder_sf")
    got = {r["event_type"]: r for r in events_disorder_stats(spark, d).collect()}
    v = got["view"]
    assert v["n_events"] == 5
    assert v["n_late"] == 1
    assert abs(v["late_frac"] - 0.2) < 1e-12
    assert v["median_late_ms"] == 0.0
    assert v["max_late_ms"] == 1000
    # exact percentile with linear interpolation over [0,0,0,0,1000]:
    # p95 index = 0.95*(5-1) = 3.8 -> 0 + 0.8*1000
    assert abs(v["p95_late_ms"] - 800.0) < 1e-9


def test_centroid_similarity_hand_computed(spark, tmp_path):
    """Per-label centroids then pairwise cosine: label 0 averages two
    vectors to [1,0]; label 1 is [0,2]; label 2 is [3,4] (norm 5)."""
    from komodo_data_spark.operators.similarity import (
        embeddings_centroid_similarity,
    )

    vecs = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.0], 0),
        (2, [0.0, 2.0], 1),
        (3, [3.0, 4.0], 2),
    ]
    table = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    d = tmp_path / "centroid_sf"
    d.mkdir()
    pq.write_table(table, d / "embeddings.parquet")
    got = {
        (r["label_a"], r["label_b"]): r
        for r in embeddings_centroid_similarity(spark, str(d)).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert got[(0, 1)]["n_a"] == 2 and got[(0, 1)]["n_b"] == 1
    assert abs(got[(0, 1)]["centroid_cosine"] - 0.0) < 1e-12
    assert abs(got[(0, 2)]["centroid_cosine"] - 0.6) < 1e-12
    assert abs(got[(1, 2)]["centroid_cosine"] - 0.8) < 1e-12
