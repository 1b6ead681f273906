"""Hand-computed pins for the round-6 depth ops: order-preserving session
transcript assembly, event-time disorder (watermark-tuning) stats, and
per-label centroid cosine. Each test builds a tiny parquet table whose
answer is computable by hand, so the semantics are pinned independently of
the DuckDB oracle pairing in scripts/check.py."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows, name="ev_sf", values=None):
    ns = 1_000_000  # ms -> ns
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * ns for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array(values or [1.0] * len(rows), pa.float64()),
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


def _write_customers(tmp_path, rows, name="cust_sf"):
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"Customer#{r[0]}" for r in rows], pa.string()),
            "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "customer.parquet")
    return str(d)


def test_k_anonymity_classes_and_floor(spark, tmp_path):
    """QI classes are (nation, segment, floor(bal/1000)); a 5-member class
    meets K_ANON=5 (below_k False, reident 0.2), singletons are flagged,
    and a negative balance floors toward -inf (band -1, its own class)."""
    from komodo_data_spark.operators.pipeline_ops import customers_k_anonymity

    rows = [(i, 1, "AUTO", 1500.0) for i in range(5)]  # band 1, size 5
    rows += [(10, 1, "AUTO", -500.0)]  # floor(-0.5) = -1: separate class
    rows += [(11, 2, "BLDG", 10.0)]  # band 0 singleton
    d = _write_customers(tmp_path, rows)
    got = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_band"]): r
        for r in customers_k_anonymity(spark, d).collect()
    }
    assert set(got) == {(1, "AUTO", 1), (1, "AUTO", -1), (2, "BLDG", 0)}
    big = got[(1, "AUTO", 1)]
    assert big["class_size"] == 5 and big["below_k"] is False
    assert abs(big["reident_prob"] - 0.2) < 1e-12
    assert got[(1, "AUTO", -1)]["below_k"] is True
    assert got[(2, "BLDG", 0)]["reident_prob"] == 1.0


def _write_embeddings(tmp_path, vecs, name="emb_sf"):
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


def test_dim_covariance_hand_values(spark, tmp_path):
    """Population covariance of perfectly dependent dims: vectors (x, 2x)
    for x in {1,2,3} give var0=2/3, cov01=4/3, var1=8/3, corr01=1, and the
    upper triangle emits exactly d(d+1)/2 = 3 rows."""
    from komodo_data_spark.operators.similarity import embeddings_dim_covariance

    d = _write_embeddings(tmp_path, [[1.0, 2.0], [2.0, 4.0], [3.0, 6.0]])
    got = {
        (r["di"], r["dj"]): r
        for r in embeddings_dim_covariance(spark, d).collect()
    }
    assert set(got) == {(0, 0), (0, 1), (1, 1)}
    assert abs(got[(0, 0)]["cov"] - 2.0 / 3.0) < 1e-12
    assert abs(got[(0, 1)]["cov"] - 4.0 / 3.0) < 1e-12
    assert abs(got[(1, 1)]["cov"] - 8.0 / 3.0) < 1e-12
    assert abs(got[(0, 1)]["corr"] - 1.0) < 1e-12
    assert got[(0, 0)]["corr"] == 1.0


def test_audience_overlap_jaccard(spark, tmp_path):
    """Pair counts come from per-user type sets: u1={view,click}, u2={view},
    u3={click,purchase,view} -> click/view co-active 2 of 3, jaccard 2/3;
    pairs no user shares (none here absent) appear iff n_both >= 1."""
    from komodo_data_spark.operators.events_analytics import (
        events_audience_overlap,
    )

    rows = [
        (1, 1000, 1, "view"), (2, 2000, 1, "click"), (3, 2500, 1, "click"),
        (4, 3000, 2, "view"),
        (5, 4000, 3, "click"), (6, 5000, 3, "purchase"), (7, 6000, 3, "view"),
    ]
    d = _write_events(tmp_path, rows, "overlap_sf")
    got = {
        (r["type_a"], r["type_b"]): r
        for r in events_audience_overlap(spark, d).collect()
    }
    assert set(got) == {
        ("click", "view"), ("click", "purchase"), ("purchase", "view"),
    }
    cv = got[("click", "view")]
    assert (cv["n_a"], cv["n_b"], cv["n_both"]) == (2, 3, 2)
    assert abs(cv["jaccard"] - 2.0 / 3.0) < 1e-12
    assert got[("click", "purchase")]["n_both"] == 1
    assert abs(got[("purchase", "view")]["jaccard"] - 1.0 / 3.0) < 1e-12


def test_kcore_peels_pendants_keeps_triangle(spark, tmp_path):
    """2-core peeling on triangle{1,2,3} + chain 3-4-5: round 1 drops the
    degree-1 tail (5), round 2 drops the now-degree-1 node 4, the triangle
    survives every round with degree 2. Copresence edges are built one per
    second: two users in the same second with |value diff|=1 in (0,50)."""
    from komodo_data_spark.operators.graph_ops import graph_kcore

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    rows, values = [], []
    for i, (a, b) in enumerate(edges):
        t = (i + 1) * 1000
        rows += [(2 * i + 1, t, a, "view"), (2 * i + 2, t, b, "view")]
        values += [10.0, 11.0]
    d = _write_events(tmp_path, rows, "kcore_sf", values=values)
    got = {r["user_id"]: r["deg"] for r in graph_kcore(spark, d).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_containment_detects_subsumed_doc(spark, tmp_path):
    """A doc whose 3-token shingles are ALL inside a longer doc has
    containment 1.0 toward it (and 4/6 back): exactly the asymmetric case
    a Jaccard threshold misses. An unrelated doc forms no pair."""
    from komodo_data_spark.operators.dedup import dedup_containment_pairs

    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),  # 4 shingles
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # superset, 6
        (3, "one two three four five six"),  # disjoint
    ]
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["t"] * len(docs), pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    d = tmp_path / "contain_sf"
    d.mkdir()
    pq.write_table(table, d / "documents.parquet")
    got = {
        (r["doc_i"], r["doc_j"]): r
        for r in dedup_containment_pairs(spark, str(d)).collect()
    }
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)]["cont_i_in_j"] - 1.0) < 1e-12
    assert abs(got[(1, 2)]["cont_j_in_i"] - 4.0 / 6.0) < 1e-12
