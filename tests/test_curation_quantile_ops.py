"""Hand-computed pins for the round-6 curation depth ops: per-source
quality-quantile filtering, CCNet-style perplexity buckets, algebraic
partial-aggregate rollup merging, and cross-label hard-negative mining.
Each test builds a tiny parquet table whose answer is computable by hand,
so the semantics are pinned independently of the DuckDB oracle pairing in
scripts/check.py."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows, name="qdocs_sf"):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = tmp_path / name
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d)


def _distinct_words(prefix: str, n: int) -> str:
    # all-distinct tokens -> TTR = 1 -> quality = min(n/100, 1)
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_quality_quantile_filter_per_source_thresholds(spark, tmp_path):
    """Thresholds are PER SOURCE: with all-distinct-token docs the quality
    score is exactly n_tokens/100, so the 75th-percentile cut is
    hand-computable. Source a: scores .1/.2/.3/.4 -> thr = .3 + .25*(.4-.3)
    = .325 -> only the .4 doc survives. Source b: scores .1/.5 ->
    thr = .1 + .75*.4 = .4 -> only the .5 doc survives. A global cut would
    have kept both b-docs out or let extra a-docs in."""
    from komodo_data_spark.operators.text_analysis import (
        docs_quality_quantile_filter,
    )

    rows = [
        (1, _distinct_words("a", 10), "en", "srca"),
        (2, _distinct_words("b", 20), "en", "srca"),
        (3, _distinct_words("c", 30), "en", "srca"),
        (4, _distinct_words("d", 40), "en", "srca"),
        (5, _distinct_words("e", 10), "en", "srcb"),
        (6, _distinct_words("f", 50), "en", "srcb"),
    ]
    d = _write_docs(tmp_path, rows)
    got = {
        r["doc_id"]: r for r in docs_quality_quantile_filter(spark, d).collect()
    }
    assert set(got) == {4, 6}
    assert abs(got[4]["quality_score"] - 0.4) < 1e-12
    assert got[4]["source"] == "srca"
    assert abs(got[6]["quality_score"] - 0.5) < 1e-12


def test_perplexity_buckets_per_lang_quartiles(spark, tmp_path):
    """Bucket sizes follow each language's OWN quartiles (en n=8 ->
    head 2 / middle 4 / tail 2; de n=4 -> head 1 / middle 2 / tail 1), and
    membership is exactly the avg_logprob order: top quartile = head,
    bottom quartile = tail. Doc texts repeat one common bigram a varying
    number of times and close with one doc-unique (hence corpus-rare)
    bigram, so every doc has a distinct average and the order is forced."""
    from komodo_data_spark.operators.text_analysis import (
        docs_perplexity_buckets,
    )

    def doc(i: int, n_common: int, lang: str) -> tuple:
        # "x x x ... x uniq<i>" -> n_common 'x x' bigrams + 1 rare bigram
        return (i, " ".join(["x"] * (n_common + 1)) + f" uniq{i}", lang, "s")

    rows = [doc(i, 2 + i, "en") for i in range(1, 9)]
    rows += [doc(10 + i, 2 + i, "de") for i in range(1, 5)]
    d = _write_docs(tmp_path, rows, name="ppl_sf")
    out = docs_perplexity_buckets(spark, d).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert {len(by_lang["en"]), len(by_lang["de"])} == {8, 4}
    for lang, n_head, n_tail in (("en", 2, 2), ("de", 1, 1)):
        rs = sorted(by_lang[lang], key=lambda r: r["avg_logprob"])
        scores = [r["avg_logprob"] for r in rs]
        assert len(set(scores)) == len(scores)  # distinct: order is forced
        n = len(rs)
        assert [r["bucket"] for r in rs] == (
            ["tail"] * n_tail
            + ["middle"] * (n - n_head - n_tail)
            + ["head"] * n_head
        )


def _write_events(tmp_path, rows, name="rm_sf"):
    """rows: (event_id, ts_ms, value-or-None)."""
    ns = 1_000_000
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * ns for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


def test_rollup_merge_moments_match_direct_aggregate(spark, tmp_path):
    """Merged hourly partials equal the hand-computed direct daily
    aggregate, including the NULL split (n_events counts traffic, n_values
    only moments) and the naive-moment variance. Day 0 spans two hours so
    the merge path is actually exercised; day 1 is a single value with
    variance exactly 0."""
    from komodo_data_spark.operators.timeseries import (
        DAY_MS,
        HOUR_MS,
        events_rollup_merge,
    )

    rows = [
        (1, 1_000, 1.0),  # day 0, hour 0
        (2, 2_000, 2.0),  # day 0, hour 0
        (3, 3_000, None),  # day 0, hour 0 — no moment contribution
        (4, HOUR_MS + 5, 4.0),  # day 0, hour 1
        (5, DAY_MS + 7, 10.0),  # day 1
    ]
    d = _write_events(tmp_path, rows)
    got = {r["day_ms"]: r for r in events_rollup_merge(spark, d).collect()}
    assert set(got) == {0, DAY_MS}
    d0 = got[0]
    assert d0["n_events"] == 4 and d0["n_values"] == 3
    assert d0["sum_value"] == 7.0
    assert d0["min_value"] == 1.0 and d0["max_value"] == 4.0
    assert abs(d0["mean_value"] - 7.0 / 3.0) < 1e-12
    # var_pop = (1+4+16)/3 - (7/3)^2 = 14/9
    assert abs(d0["var_pop_value"] - 14.0 / 9.0) < 1e-12
    d1 = got[DAY_MS]
    assert d1["n_events"] == 1 and d1["n_values"] == 1
    assert abs(d1["var_pop_value"] - 0.0) < 1e-12


def test_hard_negatives_cross_label_only_and_ranked(spark, tmp_path):
    """The identical same-label twin (cosine 1) must NOT appear; neighbors
    are exactly the cross-label vectors ranked by cosine with the
    deterministic id tie-break."""
    from komodo_data_spark.operators.similarity import (
        embeddings_hard_negatives,
    )

    vecs = [
        (0, [1.0, 0.0], 0),  # query
        (1, [1.0, 0.0], 0),  # same-label twin: excluded despite cosine 1
        (2, [0.9, 0.1], 1),
        (3, [0.0, 1.0], 1),
        (4, [1.0, 0.01], 2),
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
    d = tmp_path / "hn_sf"
    d.mkdir()
    pq.write_table(table, d / "embeddings.parquet")
    rows = [
        r
        for r in embeddings_hard_negatives(spark, str(d)).collect()
        if r["query_id"] == 0
    ]
    rows.sort(key=lambda r: r["rnk"])
    assert [r["neighbor_id"] for r in rows] == [4, 2, 3]
    assert [r["neighbor_label"] for r in rows] == [2, 1, 1]
    assert all(r["query_label"] == 0 for r in rows)
    assert rows[0]["cosine"] > rows[1]["cosine"] > rows[2]["cosine"]
    assert abs(rows[2]["cosine"] - 0.0) < 1e-12
