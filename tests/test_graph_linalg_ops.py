"""Hand-computed pins for the round-6 graph/linear-algebra depth ops:
synchronous label-propagation communities (the 3-round update rule traced
by hand on a barbell graph) and the power-iteration dominant principal
component (an axis-aligned covariance whose eigenpair is exact)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_copresence_edges(tmp_path, edges, name="lpa_sf"):
    """One events second per undirected edge: two events, different users,
    values 1.0/2.0 (distance 1 < 50) — exactly one copresence pair each."""
    rows = []
    eid = 0
    for sec, (u, v) in enumerate(edges, start=1):
        for user, val in ((u, 1.0), (v, 2.0)):
            eid += 1
            rows.append((eid, sec * 1000, user, val))
    ns = 1_000_000
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * ns for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


def test_lpa_splits_barbell_at_the_bridge(spark, tmp_path):
    """Two triangles joined by one bridge edge. Hand-traced 3 synchronous
    rounds with the (count desc, label asc) tie-break:
      r1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
      r2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
      r3: 1->1, 2->1, 3->1, 4->3, 5->3, 6->3
    so the triangles end as communities {1,2,3}=1 and {4,5,6}=3 — the
    bridge never wins a mode vote."""
    from komodo_data_spark.operators.graph_ops import graph_communities_lpa

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
    d = _write_copresence_edges(tmp_path, edges)
    got = {
        r["user_id"]: (r["community"], r["community_size"])
        for r in graph_communities_lpa(spark, d).collect()
    }
    assert got == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        4: (3, 3),
        5: (3, 3),
        6: (3, 3),
    }


def test_top_pc_axis_aligned_exact(spark, tmp_path):
    """All variance on dim 0 (x = ±1, ±2; y = 0): cov = [[2.5, 0], [0, 0]],
    so power iteration lands on loading (1, 0) with eigenvalue 2.5 after
    the first round and stays there for the remaining four."""
    from komodo_data_spark.operators.similarity import embeddings_top_pc

    vecs = [[1.0, 0.0], [-1.0, 0.0], [2.0, 0.0], [-2.0, 0.0]]
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    d = tmp_path / "pc_sf"
    d.mkdir()
    pq.write_table(table, d / "embeddings.parquet")
    got = {r["pos"]: r for r in embeddings_top_pc(spark, str(d)).collect()}
    assert set(got) == {0, 1}
    assert abs(got[0]["loading"] - 1.0) < 1e-12
    assert abs(got[1]["loading"] - 0.0) < 1e-12
    assert abs(got[0]["eigenvalue"] - 2.5) < 1e-12
    assert abs(got[1]["eigenvalue"] - 2.5) < 1e-12
