"""Tests for the retrieval / sparse-similarity / block-dedup additions:
BM25 ranked retrieval, TF-IDF cosine pairs, corpus repeated-block scrub."""

from __future__ import annotations

import math
import os

import pandas as pd

from komodo_data_spark.operators import dedup as D
from komodo_data_spark.operators import text_analysis as T


def _write_docs(tmp_path, texts: list[str]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))
    return sf


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def test_bm25_matches_hand_computed_scores(spark, tmp_path):
    """Three tiny docs; scores recomputed with the Lucene BM25 formula in
    plain Python must match the operator to float precision. A doc with no
    query term must not appear."""
    texts = [
        "spark merge spark fast",
        "slow vector slow slow table",
        "the quick brown fox",
    ]
    sf = _write_docs(tmp_path, texts)
    got = {
        r["doc_id"]: (r["bm25_score"], r["n_terms_matched"], r["dl"])
        for r in T.text_bm25_rank(spark, sf).collect()
    }

    n_docs, k1, b = 3.0, T.BM25_K1, T.BM25_B
    dls = [4, 5, 4]
    avgdl = sum(dls) / n_docs
    df = {"spark": 1, "merge": 1, "vector": 1, "slow": 1}
    tf = {1: {"spark": 2, "merge": 1}, 2: {"slow": 3, "vector": 1}}

    def score(doc: int) -> float:
        s = 0.0
        for term, f in tf[doc].items():
            idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            s += (
                idf
                * (f * (k1 + 1.0))
                / (f + k1 * (1.0 - b + b * dls[doc - 1] / avgdl))
            )
        return s

    assert set(got) == {1, 2}
    assert got[1][1:] == (2, 4)
    assert got[2][1:] == (2, 5)
    assert abs(got[1][0] - score(1)) < 1e-9
    assert abs(got[2][0] - score(2)) < 1e-9


def test_bm25_plan_is_topk_not_global_sort(spark, sf_dir):
    """The final limit must compile to TakeOrderedAndProject (per-partition
    heaps), never a global Sort over the scored corpus."""
    plan = T.text_bm25_rank(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# TF-IDF cosine pairs
# --------------------------------------------------------------------------


def test_tfidf_cosine_identical_docs_score_one(spark, tmp_path):
    """Two identical docs (sharing a rare shingle) must pair with cosine 1;
    an unrelated doc must not appear in any pair."""
    dup = "alpha bravo charlie delta echo foxtrot golf"
    texts = [dup, dup, "totally different words entirely here now"]
    sf = _write_docs(tmp_path, texts)
    rows = T.text_tfidf_cosine_pairs(spark, sf).collect()
    pairs = {(r["doc_i"], r["doc_j"]): r["cosine"] for r in rows}
    assert (1, 2) in pairs
    assert abs(pairs[(1, 2)] - 1.0) < 1e-9
    assert all(3 not in p for p in pairs)


def test_tfidf_cosine_candidates_are_equi_join_only(spark, sf_dir):
    """Candidate generation must be a shingle equi-join — no cartesian
    product in the physical plan. BroadcastNestedLoopJoin may appear only
    as the one-row df-map scalar cross-broadcast (once per weight branch),
    never as a data-data join condition."""
    plan = (
        T.text_tfidf_cosine_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "BroadcastNestedLoopJoin BuildRight, Cross"
    )


# --------------------------------------------------------------------------
# corpus repeated-block scrub
# --------------------------------------------------------------------------


def test_repeated_blocks_keep_first_occurrence_only(spark, tmp_path):
    """A block repeated across docs survives only at its lexicographically
    first (doc_id, pos); sub-block tails always survive; short docs pass
    through untouched."""
    blk = "a b c d e f g h"  # exactly BLOCK_TOKENS tokens
    texts = [
        f"{blk} x1 x2 x3 x4 x5 x6 x7 x8 tail1",  # blk at pos 0 (keeper)
        f"y1 y2 y3 y4 y5 y6 y7 y8 {blk} tail2",  # blk at pos 1 (scrubbed)
        "short doc",  # 2 tokens -> 0 blocks
    ]
    assert D.BLOCK_TOKENS == 8, "test fixture assumes 8-token blocks"
    sf = _write_docs(tmp_path, texts)
    rows = {
        r["doc_id"]: r for r in D.dedup_repeated_blocks(spark, sf).collect()
    }

    assert rows[1]["n_blocks"] == 2 and rows[1]["n_removed"] == 0
    assert rows[1]["clean_len"] == len(texts[0])
    assert rows[2]["n_blocks"] == 2 and rows[2]["n_removed"] == 1
    # doc 2 keeps its first block and its tail, loses the repeated block
    assert rows[2]["clean_len"] == len("y1 y2 y3 y4 y5 y6 y7 y8 tail2")
    assert rows[3]["n_blocks"] == 0 and rows[3]["n_removed"] == 0
    assert rows[3]["clean_len"] == len("short doc")


def test_repeated_blocks_within_doc_repeat_is_scrubbed(spark, tmp_path):
    """The keep-one rule also applies WITHIN a document: the same block
    twice in one doc keeps only the earlier position."""
    blk = "p q r s t u v w"
    texts = [f"{blk} {blk}", "unrelated filler words only in this document"]
    sf = _write_docs(tmp_path, texts)
    rows = {
        r["doc_id"]: r for r in D.dedup_repeated_blocks(spark, sf).collect()
    }
    assert rows[1]["n_blocks"] == 2 and rows[1]["n_removed"] == 1
    assert rows[1]["clean_len"] == len(blk)


# --------------------------------------------------------------------------
# Gopher-style rule flags
# --------------------------------------------------------------------------


def test_quality_rule_flags_verdicts_and_first_fail_reason(spark, tmp_path):
    """Hand-built docs hitting each rule: drop_reason is the FIRST failed
    rule in bank order, keep is the AND of all flags, and a clean doc
    passes with a NULL reason."""
    stop_pad = "the a and of to in is on for with"  # all 10 stopwords
    clean = (stop_pad + " alpha beta gamma delta epsilon zeta") * 2
    docs = [
        clean,                             # passes every rule
        "short doc",                       # fails word_count first
        # enough words but only one distinct stopword -> stopwords rule
        "the " + " ".join(f"word{i}" for i in range(30)),
        # word-count ok, stopwords ok, but one term is ~40% of the doc
        stop_pad + " spam" * 15 + " filler other tokens here",
    ]
    sf = _write_docs(tmp_path, docs)
    rows = {r["doc_id"]: r for r in T.text_quality_rule_flags(spark, sf).collect()}
    assert rows[1]["keep"] and rows[1]["drop_reason"] is None
    assert not rows[2]["keep"] and rows[2]["drop_reason"] == "word_count"
    assert not rows[3]["keep"] and rows[3]["drop_reason"] == "stopwords"
    assert rows[3]["word_count_ok"]  # word count passed; stopwords is first FAIL
    assert not rows[4]["keep"] and rows[4]["drop_reason"] == "repetition"
    for r in rows.values():
        flags = [
            r["word_count_ok"], r["mean_word_len_ok"], r["stopword_ok"],
            r["alpha_ok"], r["repetition_ok"],
        ]
        assert r["keep"] == all(flags)


def test_nb_classifier_learns_the_weak_labels(spark, tmp_path):
    """On a corpus whose weak labels ARE lexically separable (dropped docs
    speak a distinct spam vocabulary), the trained NB must reproduce the
    labels better than always answering the majority class. (On the
    uniform word-soup fixture the labels depend only on length, which a
    token-multinomial cannot express — agreement == base rate there is
    the honest outcome, so that is deliberately NOT asserted.)"""
    stop_pad = "the a and of to in is on for with"
    good = [
        stop_pad + " " + " ".join(f"topic{i}w{j}" for j in range(15))
        for i in range(12)
    ]
    bad = ["buy spam click now win prize money fast"] * 8  # short -> drop label
    sf = _write_docs(tmp_path, good + bad)
    rows = T.text_nb_quality_classifier(spark, sf).collect()
    n = sum(r["n_docs"] for r in rows)
    keep = sum(r["n_label_keep"] for r in rows)
    agree = sum(r["n_agree"] for r in rows)
    assert n == 20 and keep == 12  # both classes present as designed
    base = max(keep, n - keep) / n
    assert agree / n > base, (agree / n, base)
    for r in rows:
        assert 0 <= r["n_pred_keep"] <= r["n_docs"]


def test_bpe_learns_hand_computed_merges(spark, tmp_path):
    """Tiny corpus with a fully hand-derivable BPE fit: corpus
    'abab ab' + 'ab abab' gives vocabulary {abab: 2, ab: 2}; weighted
    pair counts are (a,b)=6 vs (b,a)=2, so merge 0 is (a,b)->'ab'; after
    applying, only 'abab' = [ab, ab] has a pair, so merge 1 is
    (ab,ab)->'abab'; every later round is the sentinel no-op (excluded
    from the merge table). Final exact counts: both docs tokenize to 2
    BPE tokens over 2 words."""
    sf = _write_docs(tmp_path, ["abab ab", "ab abab"])
    merges = [
        (r["rank"], r["a"], r["b"])
        for r in T.text_bpe_merges(spark, sf).collect()
    ]
    assert merges == [(0, "a", "b"), (1, "ab", "ab")]
    counts = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in T.text_bpe_train_apply(spark, sf).collect()
    }
    assert counts == {1: (2, 2), 2: (2, 2)}


def test_nb_calibration_bins_are_consistent(spark, tmp_path):
    """Calibration invariants on the separable fixture: bins partition the
    corpus (sum n_docs == N), every mean_pred sits inside its bin's
    probability range, keep_rate is a rate, and sum(ece_term) equals the
    directly recomputed expected calibration error."""
    stop_pad = "the a and of to in is on for with"
    good = [
        stop_pad + " " + " ".join(f"topic{i}w{j}" for j in range(15))
        for i in range(12)
    ]
    bad = ["buy spam click now win prize money fast"] * 8
    sf = _write_docs(tmp_path, good + bad)
    rows = T.text_nb_calibration(spark, sf).collect()
    n = sum(r["n_docs"] for r in rows)
    assert n == 20
    for r in rows:
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0
        hi = 1.0 if r["bin"] == 9 else hi  # top bin is closed at 1.0
        assert lo <= r["mean_pred"] <= hi + 1e-12, r
        assert 0.0 <= r["keep_rate"] <= 1.0
    ece = sum(
        r["n_docs"] / n * abs(r["mean_pred"] - r["keep_rate"]) for r in rows
    )
    assert abs(sum(r["ece_term"] for r in rows) - ece) < 1e-12
