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


# --------------------------------------------------------------------------
# hybrid RRF fusion + label-based retrieval metrics
# --------------------------------------------------------------------------


def _write_embeddings(sf: str, vecs: list[list[float]], labels: list[int]):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tb, os.path.join(sf, "embeddings.parquet"))


def test_rrf_hand_computed_fusion(spark, tmp_path):
    """Two docs rank lexically (1 above 2), three embeddings rank densely
    (2, 1, 3). Fused scores must be exactly 1/(60+r_lex) + 1/(60+r_dense),
    the 1<->2 tie must break by doc_id, and the dense-only doc 3 must
    still appear with a NULL lex_rank."""
    from komodo_data_spark.operators import retrieval as R

    texts = [
        "pad",  # doc_id 0 in embeddings but no doc 0 exists; ids start at 1
        "spark spark merge vector slow",  # doc 1: every query term, highest
        "spark merge extra words here now",  # doc 2: two query terms
        "nothing relevant at all",  # doc 3: no query terms
    ]
    sf = _write_docs(tmp_path, texts[1:])
    # vec 0 = query; dense order by cosine: vec 2 > vec 1 > vec 3
    _write_embeddings(
        sf,
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.8, 0.2, 0.0, 0.0],
            [0.95, 0.05, 0.0, 0.0],
            [0.1, 0.9, 0.0, 0.0],
        ],
        [0, 0, 0, 1],
    )
    rows = {r["doc_id"]: r for r in R.retrieval_hybrid_rrf(spark, sf).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["lex_rank"], rows[1]["dense_rank"]) == (1, 2)
    assert (rows[2]["lex_rank"], rows[2]["dense_rank"]) == (2, 1)
    assert (rows[3]["lex_rank"], rows[3]["dense_rank"]) == (None, 3)
    assert abs(rows[1]["rrf_score"] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(rows[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(rows[3]["rrf_score"] - 1 / 63) < 1e-12
    # identical scores for docs 1 and 2: ordering ties broken by doc_id
    ordered = [
        r["doc_id"]
        for r in R.retrieval_hybrid_rrf(spark, sf)
        .orderBy("doc_id")
        .collect()
    ]
    assert ordered == [1, 2, 3]


def test_label_metrics_hand_computed(spark, tmp_path):
    """Six vectors in two cosine-separable label groups. For query 0
    (label 1, true neighbors 1 and 2 ranked first): hits=2, mrr=1,
    precision@5 = 2/5, and NDCG@5 = 1 because the two relevant docs fill
    the first two slots and IDCG also has exactly two slots (n_relevant=2
    < k). The IVF row for query 0 must be the all-zero left-join path:
    with <= N_CELLS vectors every vector is its own singleton cell, so
    the cell search retrieves nothing."""
    import math

    from komodo_data_spark.operators import retrieval as R

    sf = _write_docs(tmp_path, ["x"])  # documents table present but unused
    _write_embeddings(
        sf,
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.9, 0.1, 0.0, 0.0],
            [0.8, 0.2, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.1, 0.9, 0.0, 0.0],
            [0.2, 0.8, 0.0, 0.0],
        ],
        [1, 1, 1, 2, 2, 2],
    )
    rows = {
        (r["method"], r["query_id"]): r
        for r in R.retrieval_label_metrics(spark, sf).collect()
    }
    b0 = rows[("brute", 0)]
    assert (b0["n_relevant"], b0["n_retrieved"], b0["hits"]) == (2, 5, 2)
    assert abs(b0["precision_at_k"] - 2 / 5) < 1e-12
    assert abs(b0["mrr"] - 1.0) < 1e-12
    assert abs(b0["ndcg_at_k"] - 1.0) < 1e-12
    # worst query of group 2: vec 3 ([0,1,..]) still sees 4,5 first (cos
    # 0.9.. vs cross-group <= 0.2), so its metrics mirror b0
    b3 = rows[("brute", 3)]
    assert (b3["hits"], b3["mrr"], b3["ndcg_at_k"]) == (2, 1.0, 1.0)
    i0 = rows[("ivf", 0)]
    assert (i0["n_retrieved"], i0["hits"], i0["mrr"]) == (0, 0, 0.0)
    assert i0["ndcg_at_k"] == 0.0 and i0["precision_at_k"] == 0.0
    # dcg sanity on a mixed ranking: query 1 retrieves 0,2 (rel) then the
    # group-2 vectors; dcg = 1/log2(2) + 1/log2(3), idcg identical
    b1 = rows[("brute", 1)]
    want = (1 / math.log2(2) + 1 / math.log2(3)) / (
        1 / math.log2(2) + 1 / math.log2(3)
    )
    assert abs(b1["ndcg_at_k"] - want) < 1e-12


def test_unigram_lm_hand_computed(spark, tmp_path):
    """Two-round Viterbi-EM on corpora small enough to run by hand.

    Corpus A: two 'aaaa' words. Seed counts (weighted, all positions):
    a=8, aa=6, aaa=4, total 18. Viterbi over 'aaaa': aa+aa = 2*ln(6/18)
    = -2.197 beats aaa+a (-2.315) and a*4 (-3.24) -> uses: aa = 2 words
    * 2 pieces = 4. M-step (Laplace over the 3 seed pieces): aa ->
    ln(5/7), a and aaa -> ln(1/7). Round 2 re-segments identically
    (aa+aa = 2*ln(5/7) still wins), so the output is the single used
    piece 'aa' with n_uses 4 and score_q = round(ln(5/7)*1e6).

    Corpus B: words 'ab' and 'cd' once each. All 6 seed pieces tie at
    c=1; one-piece paths win (ln(1/6) > 2*ln(1/6)), so uses are ab=1,
    cd=1 and both score round(ln(2/8)*1e6) after smoothing (tot=2, P=6).
    """
    import math

    from komodo_data_spark.operators.text_analysis import text_unigram_lm

    sf = _write_docs(tmp_path, ["aaaa aaaa"])
    rows = text_unigram_lm(spark, sf).collect()
    assert [(r["rank"], r["piece"], r["n_uses"]) for r in rows] == [
        (1, "aa", 4)
    ]
    assert rows[0]["score_q"] == round(math.log(5 / 7) * 1_000_000)

    sf2 = _write_docs(tmp_path, ["ab cd"])
    rows2 = text_unigram_lm(spark, sf2).collect()
    assert [(r["rank"], r["piece"], r["n_uses"]) for r in rows2] == [
        (1, "ab", 1),
        (2, "cd", 1),
    ]
    assert {r["score_q"] for r in rows2} == {
        round(math.log(2 / 8) * 1_000_000)
    }


# --------------------------------------------------------------------------
# Kneser-Ney
# --------------------------------------------------------------------------


def test_kneser_ney_matches_hand_computed_probs(spark, tmp_path):
    """Two tiny docs; per-doc average KN log-prob recomputed with the
    interpolated bigram formula in plain Python must match the operator to
    float precision (same D, same continuation counts)."""
    import collections

    texts = ["a b a b c", "a b x"]
    sf = _write_docs(tmp_path, texts)

    D_ = T.KN_DISCOUNT
    grams_by_doc = {}
    model = collections.Counter()
    for i, t in enumerate(texts, start=1):
        toks = t.split()
        gs = list(zip(toks, toks[1:]))
        grams_by_doc[i] = gs
        model.update(gs)
    c_u = collections.Counter()
    n1p_u = collections.Counter()
    n1p_w = collections.Counter()
    for (u, w), c in model.items():
        c_u[u] += c
        n1p_u[u] += 1
        n1p_w[w] += 1
    t_types = len(model)

    def p_kn(u, w):
        return max(model[(u, w)] - D_, 0.0) / c_u[u] + (
            D_ * n1p_u[u] / c_u[u] * n1p_w[w] / t_types
        )

    expected = {
        doc: sum(math.log(p_kn(u, w)) for u, w in gs) / len(gs)
        for doc, gs in grams_by_doc.items()
    }
    rows = {
        r["doc_id"]: r
        for r in T.text_kneser_ney_logprob(spark, sf).collect()
    }
    assert set(rows) == set(expected)
    for doc, want in expected.items():
        assert rows[doc]["n_bigrams"] == len(grams_by_doc[doc])
        assert abs(rows[doc]["avg_logprob_kn"] - want) < 1e-12
    # probability mass sanity: for a context seen in the fit, the KN
    # distribution over FIT-VOCABULARY continuations sums to <= 1 (equality
    # when every vocab word is a seen continuation type somewhere)
    vocab_w = set(n1p_w)
    mass = sum(p_kn("a", w) for w in vocab_w)
    assert mass <= 1.0 + 1e-12


def test_entropy_stats_hand_computed(spark, tmp_path):
    """Three shapes: degenerate (one repeated token -> entropy 0, keep
    False), uniform ("a b c d" -> H = ln 4, norm 1), and a skewed mix
    recomputed with the plain-Python Shannon formula."""
    import collections

    texts = ["x x x x x", "a b c d", "a a a b"]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in T.text_entropy_stats(spark, sf).collect()}

    assert rows[1]["entropy"] == 0.0
    assert rows[1]["entropy_norm"] == 0.0
    assert rows[1]["keep"] is False

    assert abs(rows[2]["entropy"] - math.log(4)) < 1e-12
    assert abs(rows[2]["entropy_norm"] - 1.0) < 1e-12
    assert rows[2]["keep"] is True

    c = collections.Counter(texts[2].split())
    n = sum(c.values())
    want = -sum(v / n * math.log(v / n) for v in c.values())
    assert abs(rows[3]["entropy"] - want) < 1e-12
    assert abs(rows[3]["entropy_norm"] - want / math.log(2)) < 1e-12


def test_kneser_ney_apply_oov_backoff(spark, tmp_path):
    """Frozen-model scoring: non-train docs score under the train-split
    model with positive probability for unseen pairs/contexts/words, and
    every per-doc average matches a plain-Python mirror of the backoff
    ladder (seen pair -> interpolated; unseen pair, seen context ->
    continuation-interpolated; unseen context -> smoothed continuation)."""
    import collections

    from komodo_data_spark.operators.pipeline_ops import _split_col
    from komodo_data_spark.sources.tables import load_table

    # enough docs that the md5 split assigns some to train and some not
    texts = [f"w{i} common mid common w{i} tail{i % 5}" for i in range(40)]
    sf = _write_docs(tmp_path, texts)

    splits = {
        r["doc_id"]: r["split"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", _split_col().alias("split"))
        .collect()
    }
    assert set(splits.values()) >= {"train"}  # sanity: a train split exists

    D_, A_ = T.KN_DISCOUNT, T.KN_OOV_ALPHA
    model = collections.Counter()
    for doc_id, t in enumerate(texts, start=1):
        if splits[doc_id] != "train":
            continue
        toks = t.split()
        model.update(zip(toks, toks[1:]))
    c_u, n1p_u, n1p_w = (
        collections.Counter(),
        collections.Counter(),
        collections.Counter(),
    )
    for (u, w), c in model.items():
        c_u[u] += c
        n1p_u[u] += 1
        n1p_w[w] += 1
    t_types, v_types = len(model), len(n1p_w)

    def p_apply(u, w):
        pcont = (n1p_w.get(w, 0) + A_) / (t_types + A_ * (v_types + 1))
        if u not in c_u:
            return pcont
        return max(model.get((u, w), 0) - D_, 0.0) / c_u[u] + (
            D_ * n1p_u[u] / c_u[u] * pcont
        )

    rows = {
        r["doc_id"]: r for r in T.text_kneser_ney_apply(spark, sf).collect()
    }
    for doc_id, t in enumerate(texts, start=1):
        toks = t.split()
        gs = list(zip(toks, toks[1:]))
        want = sum(math.log(p_apply(u, w)) for u, w in gs) / len(gs)
        assert rows[doc_id]["split"] == splits[doc_id]
        assert abs(rows[doc_id]["avg_logprob_kn"] - want) < 1e-12


def test_textrank_hand_computed_two_node_graph(spark, tmp_path):
    """A two-word corpus ("alpha beta" repeated): the graph is one
    symmetric edge, so both words keep pr = 1/2 through every iteration
    (the uniform vector is stationary), score_q = round(0.5e9), and the
    rank tie breaks lexicographically."""
    sf = _write_docs(tmp_path, ["alpha beta", "beta alpha"])
    rows = T.text_textrank_keywords(spark, sf).collect()
    assert [(r["rank"], r["word"], r["score_q"]) for r in rows] == [
        (1, "alpha", 500000000),
        (2, "beta", 500000000),
    ]


def test_textrank_hub_outranks_leaves(spark, tmp_path):
    """A star graph (hub adjacent to many leaves) must rank the hub
    first — centrality, not frequency: every word here appears equally
    often per edge."""
    sf = _write_docs(tmp_path, [f"hub leaf{i}" for i in range(6)])
    rows = T.text_textrank_keywords(spark, sf).collect()
    assert rows[0]["word"] == "hub"
    assert rows[0]["rank"] == 1
    assert len(rows) == 7  # hub + 6 leaves, all under TEXTRANK_K
