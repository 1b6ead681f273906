"""Plan audit: capture physical plans + plan-quality stats into PLANS.md.

For each audited query this records the counts that matter at 100 TB —
exchanges (shuffles), broadcast vs sort-merge joins, whole-stage-codegen
spans, Python eval stages, and whether the parquet scans carry pushed
filters / pruned schemas — followed by the full ``explain("formatted")``
output. Run: ``python scripts/explain_audit.py [sf_dir]``.

This is the review artifact for "is this the plan you'd want": the same
properties the plan-shape tests (tests/test_plans.py) pin as regressions,
but for human eyes and across a wider query slice.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from komodo_data_spark.plans.audit import (  # noqa: E402
    executed_plan_string,
    formatted_plan,
    plan_stats,
)

#: Queries whose plans get a full dump: one representative per family.
AUDITED = [
    "q3_shipping_priority",  # TPC-H join pyramid: broadcast dims
    "events_hourly_rollup",  # tumbling rollup: partial agg before shuffle
    "dedup_minhash_lsh",  # postings agg + banded self-join
    "dedup_embedding_pairs",  # block-pair cogroup matmul, no driver collect
    "dedup_substring_spans",  # positional grams -> dup semi-join -> islands
    "dedup_substring_scrub",  # span list join + indexed HOF filter, no Python
    "events_interarrival_stats",  # per-user lag window + bounded percentiles
    "source_unigram_divergence",  # distributed vocab model, two aggregates
    "events_type_correlations",  # dense spine, hour equi-join, corr() pairs
    "dedup_semantic",  # broadcast-centroid kmeans + per-cluster pandas prune
    "customers_fuzzy_name_pairs",  # deletion-neighborhood bucketed fuzzy join
    "events_value_psi_drift",  # one combinable agg + KB-scale PSI arithmetic
    "text_quality_classifier",  # one codegen projection + tiny rollup
    "benchmark_contamination",  # broadcast benchmark set, count-join
    "funnel_conversion",  # co-partitioned aggregate/join chain
    "knn_brute_force",  # broadcast queries x corpus, codegen dot product
    "profile_orders",  # single-pass multi-distinct profile
    "text_repetition_signals",  # pure map stage, zero shuffle
    "corpus_prepare",  # composed 4-stage pipeline, one plan
    "cdc_apply_changes",  # latest-per-key window, no join
    "docs_surrogate_keys",  # range-partition + offset prefix-sum ordinals
    "events_gapfill_locf",  # spine explode + left join + running LOCF
    "session_overlap_pairs",  # chunk-blocked interval equi-join
    "events_heavy_hitters",  # approx_top_k sketch, one pass
    "orders_expectations",  # one-pass rule CASE sums + distinct Expand
    "text_bm25_rank",  # map-side query filter, broadcast consts, top-k heap
    "text_tfidf_cosine_pairs",  # rare-shingle candidates + row-local verify
    "dedup_repeated_blocks",  # block-freq agg + broadcast dup-map scrub
    "text_pii_scan",  # three regexp banks in one codegen map pass
    "text_quality_rule_flags",  # explode -> two chained doc_id aggs
    "docs_domain_stats",  # host-extract projection + two combinable aggs
    "dedup_minhash_recall",  # eval: scalar counts, broadcast cross join
    "text_nb_quality_classifier",  # NB train+apply: broadcast LLR, no hot-term shuffle
    "dedup_embedding_lsh",  # occupancy-routed hybrid: window shares the cold exchange
    "benchmark_contamination_semantic",  # broadcast bench row, HOF lambdas, map-only
    "source_ngram_diversity",  # two-stage distinct keyed by (source, shingle)
    "docs_split_by_cluster",  # pairs cached once -> star labels + leak probe
    "token_packing_stats",  # candidate-length explode, one combinable agg
    "text_compression_ratio",  # the one legitimately-Python map stage
    "events_session_transcripts",  # one exchange reused by window + groupBy
    "events_audience_overlap",  # per-user set expansion, no long-form self-join
    "embeddings_dim_covariance",  # upper-triangle explode, map-side combine
    "dedup_containment_pairs",  # df-capped candidates + postings common-count
    "graph_kcore",  # per-round shrinking semi-joins, checkpointed lineage
    "knn_pq_adc",  # one Lloyd pipeline for all subspaces, broadcast codebook
    "docs_dsir_weights",  # broadcast 256-bucket model, doc_id-keyed rollup
    "docs_dsir_resample",  # Gumbel projection -> TakeOrderedAndProject
    "docs_quality_quantile_filter",  # agg thresholds + broadcast-back filter
    "docs_perplexity_buckets",  # reused LM scorer + per-lang quartile cut
    "events_rollup_merge",  # cascaded hash aggregates, partials merge
    "embeddings_hard_negatives",  # broadcast queries, label filter in join
    "graph_communities_lpa",  # per-round join+max_by, checkpointed lineage
    "embeddings_top_pc",  # corpus-once covariance + d²-row matvec rounds
    "events_ks_test",  # two-stage bucketed CDF prefix sum, no global sort
    "events_welch_ttest",  # one conditional-aggregate pass, scalar algebra
    "part_skyline",  # 2-D Pareto front via two-stage prefix min, no n² join
    "parts_market_basket",  # map-side basket pair explode, no self-join
    "customer_rfm_segments",  # quintile rows broadcast onto customers
    "docs_quality_band_filter",  # bucket-prefix order statistics, both cuts one fit
    "knn_ivfpq_adc",  # kmeans cells + residual PQ, broadcast codebooks
    "events_value_percentiles_hist",  # one combinable bin agg + tiny interpolation
    "text_unigram_lm",  # vocab-bounded EM, row-local DP (no per-position joins)
    "events_cusum_changepoint",  # day-partial agg + tiny running-sum window
    "events_mannwhitney_u",  # tie-group counts + bucketed rank prefix
    "media_simhash_pairs",  # frame-gram votes + pigeonhole segment equi-join
    "dedup_simhash",  # r9: 64-bit shingle votes + 8x8-bit pigeonhole equi-join
    "docs_chunk_windows",  # pure map-side explode, zero exchanges
    "text_cooccurrence_pmi",  # pair explode + combinable agg, marginals from pairs
    "orders_benford_digits",  # one digit aggregate, 9-row result
    "docs_stratified_sample",  # kth-smallest-hash cutoff, no per-stratum sort
    "events_seasonal_anomalies",  # (type, hod) baseline broadcast, one-pass flag
    "token_packing",  # range-partitioned prefix sums, no per-lang global sort
    "docs_quality_token_weighted_filter",  # weighted bucket-prefix fit + broadcast-back
    "dedup_simhash_recall",  # sliced truth self-join + pigeonhole detector, scalar counts
    "media_simhash_recall",  # shared gram pass cached, sliced truth + detector
    "benchmark_contamination_bloom",  # r9: BUCKETED bloom broadcast equi-join, shuffle join on survivors
    "events_mad_outliers",  # two chained bucket-prefix medians, map-side flag
    "events_spearman_trend",  # bucketed midranks x2 + one corr aggregate
    "docs_ppl_token_weighted_buckets",  # micro-nat weighted terciles, broadcast-back
    "events_hourly_acf",  # tiny hourly frame, lag self-join + corr
    "customers_l_diversity",  # two chained hash aggregates, QI-bounded output
    "dedup_ngram_pairs_prefix",  # r9: prefix candidates + length/positional filters + intersect verify
    "token_packing_sequences",  # r9: two-stage offsets + map-side sequence explode
    "customers_t_closeness",  # r9: one corpus agg, broadcast global mix, integer TV
    "customers_t_closeness_emd",  # r9: densified class x band cumsum, QI-bounded frames
    "dedup_minhash_oph",  # r9: ONE md5/posting signature, shared band equi-join
    "text_kneser_ney_logprob",  # r9: model-frame aggregates + 3 score joins
    "docs_dp_release",  # r9: one count agg, per-cell codegen'd Laplace
    "events_ewma_hourly",  # r9: count partials + bounded 24-row frames
    "text_bpe_merges_batched",  # r10: vocab-bounded rounds, topc-row wave joins
    "text_kneser_ney3_logprob",  # r10: five type-level model aggs + 5 score joins
    "text_kneser_ney3_apply",  # r10: frozen trigram model, LEFT score joins
    "text_textrank_keywords",  # r10: TakeOrderedAndProject top-k (was 1-task window)
    "text_entropy_stats",  # r10: zero-shuffle map pass, per-doc count map
    "dedup_fuzzy_prefix",  # r10: PassJoin + linear volume-guard aggregates
    "dedup_fuzzy_prefix_capped",  # r11: occupancy-filtered keys, linear bound
    "media_simhash_pairs_capped",  # r11: capped pigeonhole, min-hamming dedup
    "text_bpe_encode",  # r11: shared session fit + broadcast apply join
    "knn_ivfpq_recall",  # r11: consumes the shared index build
]

#: Python stages expected by design (Arrow-batched pandas ops); anything
#: else showing a Python eval is a hot-path regression.
PYTHON_OK = {
    "dedup_embedding_pairs",
    "dedup_embedding_lsh",
    "dedup_semantic",
    "text_compression_ratio",
    "media_frame_samples",
    "media_resize",
}






def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from komodo_data_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    out = [
        "# PLANS — physical-plan audit\n",
        f"Generated by `scripts/explain_audit.py` at `{sf_dir}`. For each",
        "representative query: shuffle/join/codegen counts, then the full",
        "`explain(\"formatted\")`. Python stages are expected ONLY in the",
        f"Arrow-batched ops ({', '.join(sorted(PYTHON_OK))}).\n",
        "## Summary\n",
        "| query | exchanges | broadcast joins | sort-merge joins |"
        " codegen spans | python stages | pushed filters |",
        "|---|---|---|---|---|---|---|",
    ]
    details = []
    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        simple = executed_plan_string(df)
        plan = formatted_plan(df)
        s = plan_stats(simple)
        spark.catalog.clearCache()
        if s["python_stages"] and name not in PYTHON_OK:
            print(f"WARNING: unexpected Python stage in {name}", file=sys.stderr)
        out.append(
            f"| {name} | {s['exchanges']} | {s['broadcast_joins']} |"
            f" {s['sortmerge_joins']} | {s['codegen_spans']} |"
            f" {s['python_stages']} | {s['pushed_filters']} |"
        )
        details.append(f"\n## {name}\n\n```\n{plan}```\n")
    out.append(
        "\nEvery audited query runs shuffle-lean (exchanges are the"
        " aggregation/join keys the semantics require), joins small sides"
        " by broadcast, and keeps the hot path inside whole-stage codegen."
    )
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n" + "".join(details))
    print(f"PLANS.md written ({len(AUDITED)} plans)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
