"""Reference-twin pins for the product-quantization ANN rung and the
DSIR importance-resampling ops: each Spark result is checked against an
independent pure-Python/numpy reimplementation on tiny synthetic tables,
so the semantics (deterministic Lloyd init/ties, ADC scoring, hashed
bag-of-buckets likelihood ratios, Gumbel-top-K keys) are pinned
independently of the DuckDB oracle pairing in scripts/check.py."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_embeddings(tmp_path, mat, name="pq_sf"):
    table = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


def _pq_numpy(mat):
    """Independent PQ twin: per-subspace Lloyd (init = first PQ_K rows'
    subvectors, PQ_ITERS rounds, argmin ties -> lowest cid, empty clusters
    dropped), then reconstruction by codebook lookup."""
    from komodo_data_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
    )

    rec = np.zeros_like(mat)
    for m in range(PQ_M):
        sub = mat[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        cents = {cid: sub[cid].copy() for cid in range(PQ_K)}

        def assign(cents):
            cids = sorted(cents)
            d = np.stack(
                [((sub - cents[c][None, :]) ** 2).sum(axis=1) for c in cids]
            )
            return np.array([cids[i] for i in d.argmin(axis=0)])

        for _ in range(PQ_ITERS):
            a = assign(cents)
            cents = {
                cid: sub[a == cid].mean(axis=0) for cid in np.unique(a)
            }
        a = assign(cents)
        for i, cid in enumerate(a):
            rec[i, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] = cents[cid]
    return rec


def test_pq_adc_matches_numpy_reference(spark, tmp_path):
    """Spark's distributed PQ (one Lloyd pipeline across all subspaces)
    must equal the sequential numpy twin: same codes, same reconstructed
    vectors, same ADC top-K per query."""
    from komodo_data_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        knn_pq_adc,
    )

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((24, 64)).astype(np.float32).astype(np.float64)
    d = _write_embeddings(tmp_path, mat.astype(np.float32))

    rec = _pq_numpy(mat)
    expected = {}
    for qid in range(N_QUERIES):
        q = mat[qid]
        scores = []
        for nid in range(len(mat)):
            if nid == qid:
                continue
            r = rec[nid]
            cos = float(
                q @ r / (np.linalg.norm(q) * np.linalg.norm(r))
            )
            scores.append((-cos, nid))
        for rnk, (neg, nid) in enumerate(sorted(scores)[:TOP_K], start=1):
            expected[(qid, nid)] = (rnk, -neg)

    got = {
        (r["query_id"], r["neighbor_id"]): (r["rnk"], r["adc_cosine"])
        for r in knn_pq_adc(spark, d).collect()
    }
    assert set(got) == set(expected)
    for key, (rnk, cos) in expected.items():
        assert got[key][0] == rnk
        assert abs(got[key][1] - cos) < 1e-9


def test_pq_recall_against_exact_topk(spark, tmp_path):
    """Recall rows: one per query, n_hit = |PQ top-K ∩ exact top-K|,
    recall = n_hit / K — recomputed here from the two searches' own
    outputs so the eval join can't drift from its definition."""
    from komodo_data_spark.operators.similarity import (
        knn_brute_force,
        knn_pq_adc,
        knn_pq_recall,
    )

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((20, 64)).astype(np.float32)
    d = _write_embeddings(tmp_path, mat, name="pqr_sf")

    bf = {}
    for r in knn_brute_force(spark, d).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in knn_pq_adc(spark, d).collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {r["query_id"]: r for r in knn_pq_recall(spark, d).collect()}
    assert set(got) == set(bf)
    for qid, truth in bf.items():
        hits = len(truth & ap.get(qid, set()))
        assert got[qid]["n_hit"] == hits
        assert abs(got[qid]["recall"] - hits / len(truth)) < 1e-12


def test_pq_published_equals_refit(spark, tmp_path):
    """Cross-session contract: searching through a PUBLISHED frozen
    codebook (publish → require_store → read → broadcast encode + ADC)
    returns row-for-row what the in-session fit returns — the codebook
    IS the model, and `_pq_assign` is the one encoding expression both
    paths share. Also pins the require_store precondition and the
    session memo (one Lloyd fit for adc + recall + publish)."""
    import pytest

    from komodo_data_spark.operators.similarity import (
        _pq_fit_shared,
        knn_pq_adc,
        knn_pq_apply_published,
        publish_pq_model,
    )

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((24, 64)).astype(np.float32)
    d = _write_embeddings(tmp_path, mat, name="pqp_sf")
    model = str(tmp_path / "pq_model")

    # unpublished store fails fast at the gate, not mid-query
    with pytest.raises(RuntimeError, match="never been published"):
        knn_pq_apply_published(spark, d, model)

    refit = {tuple(r) for r in knn_pq_adc(spark, d).collect()}
    publish_pq_model(spark, d, model)
    published = {
        tuple(r) for r in knn_pq_apply_published(spark, d, model).collect()
    }
    assert published == refit
    assert published  # non-vacuous

    # the memo hands every consumer the SAME checkpointed frames
    f1 = _pq_fit_shared(spark, d)
    f2 = _pq_fit_shared(spark, d)
    assert f1[0] is f2[0] and f1[1] is f2[1]


def _write_docs(tmp_path, rows, name="dsir_sf"):
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = tmp_path / name
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d)


def _dsir_python(rows):
    """Pure-Python DSIR twin: hashed-unigram bag-of-buckets models with
    add-alpha smoothing, per-raw-doc log-likelihood-ratio weights."""
    from komodo_data_spark.operators.pipeline_ops import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCE,
    )

    def buckets(text):
        toks = re.split(r"\s+", text.strip().lower())
        return [
            int(hashlib.md5(t.encode()).hexdigest()[:2], 16) for t in toks
        ]

    nt = [0] * DSIR_BUCKETS
    nr = [0] * DSIR_BUCKETS
    for _doc, text, src in rows:
        for b in buckets(text):
            (nt if src == DSIR_TARGET_SOURCE else nr)[b] += 1
    tt, tr = sum(nt), sum(nr)
    a, nb = DSIR_ALPHA, DSIR_BUCKETS
    llr = [
        math.log((nt[b] + a) / (tt + a * nb))
        - math.log((nr[b] + a) / (tr + a * nb))
        for b in range(nb)
    ]
    out = {}
    for doc, text, src in rows:
        if src == DSIR_TARGET_SOURCE:
            continue
        bs = buckets(text)
        out[doc] = (len(bs), sum(llr[b] for b in bs))
    return out


def test_dsir_weights_match_python(spark, tmp_path):
    """Spark weights equal the sequential twin, and a raw doc written in
    the target's vocabulary outranks a vocabulary-disjoint one."""
    from komodo_data_spark.operators.pipeline_ops import docs_dsir_weights

    rows = [
        (1, "alpha beta gamma alpha", "src0"),
        (2, "alpha beta delta", "src0"),
        (3, "alpha beta gamma", "srcX"),  # target-like raw doc
        (4, "zeta eta theta iota", "srcY"),  # disjoint raw doc
        (5, "beta beta zeta", "srcX"),
    ]
    d = _write_docs(tmp_path, rows)
    expected = _dsir_python(rows)
    got = {
        r["doc_id"]: (r["n_toks"], r["log_weight"])
        for r in docs_dsir_weights(spark, d).collect()
    }
    assert set(got) == set(expected)
    for doc, (n, lw) in expected.items():
        assert got[doc][0] == n
        assert abs(got[doc][1] - lw) < 1e-9
    assert got[3][1] > got[4][1]


def test_dsir_resample_gumbel_keys(spark, tmp_path):
    """With fewer raw docs than DSIR_SAMPLE_K every raw doc is returned,
    and each Gumbel key equals log_weight − ln(−ln(u)) with the
    deterministic md5-derived u — recomputed independently here."""
    from komodo_data_spark.operators.pipeline_ops import docs_dsir_resample

    rows = [
        (1, "alpha beta gamma", "src0"),
        (2, "alpha beta", "srcX"),
        (3, "gamma delta", "srcY"),
        (4, "zeta eta", "srcZ"),
    ]
    d = _write_docs(tmp_path, rows)
    weights = _dsir_python(rows)
    got = {
        r["doc_id"]: (r["log_weight"], r["gumbel_key"])
        for r in docs_dsir_resample(spark, d).collect()
    }
    assert set(got) == {2, 3, 4}
    for doc, (lw, gk) in got.items():
        u = (
            int(
                hashlib.md5(f"dsir|{doc}".encode()).hexdigest()[:6], 16
            )
            + 0.5
        ) / 16**6
        expected_key = weights[doc][1] - math.log(-math.log(u))
        assert abs(lw - weights[doc][1]) < 1e-9
        assert abs(gk - expected_key) < 1e-9
