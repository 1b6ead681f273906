"""Training-data pipeline operators: deterministic splits, chunking,
redaction, dedup clustering, and sequence packing.

These extend the north-star surface (SURVEY §2.12) with the ops a corpus
pipeline runs between "raw documents" and "training batches". None exist in
the reference (gelic-idealab/komodo-data has no document processing at all —
process.py is XR telemetry only); they are engine-completeness additions.

Scale notes (100 TB):
- ``sample_hash_split`` assigns splits by content hash, NOT by random() or a
  global sort — assignment is stable under reshuffles, retries, and
  incremental appends, and is pure map-side (no shuffle before the final
  small aggregate).
- ``doc_chunks`` is a map-side explode (no shuffle); chunk count scales with
  input size, not distinct keys.
- ``term_redaction`` is pure projection (whole-stage codegen regexp).
- ``dedup_clusters`` runs min-label propagation over the near-dup pair
  graph: each round is one shuffle join keyed by node; rounds are bounded by
  component diameter, and near-dup graphs are overwhelmingly tiny cliques
  (diameter ≤ 2-3). Lineage is truncated per round with localCheckpoint so
  the plan doesn't grow exponentially. For adversarial long-chain graphs,
  swap the propagation body for alternating large-star/small-star — same
  join shape, O(log n) rounds.
- ``token_packing`` is the deterministic "concatenate in key order, cut at
  capacity" packing. The naive form (one window cumsum per language) caps
  parallelism at |langs| — every document of a language flows through ONE
  task for the ordered cumsum. It instead runs the surrogate-keys /
  twostage-budget shape: range-partition on (lang, doc_id), aggregate token
  sums per (lang, partition) into a tiny frame, prefix-sum that frame,
  broadcast the offsets back, cumsum within partitions — every stage
  bounded by a partition, so the English slab of a 100 TB corpus packs in
  parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from komodo_data_spark.functions.text_features import sql_tokens, tokens
from komodo_data_spark.sources.tables import load_events, load_table

# --------------------------------------------------------------------------
# deterministic hash split (train/val/test)
# --------------------------------------------------------------------------

_TRAIN_END = 80  # bucket < 80  -> train
_VAL_END = 90  # 80..89       -> val; 90..99 -> test


def _bucket_col(key: F.Column | None = None, mod: int = 100) -> F.Column:
    # first 8 md5 hex digits -> int -> % mod. Portable: DuckDB twin is
    # CAST('0x' || substr(md5(...),1,8) AS UBIGINT) % mod. ``key``
    # defaults to doc_id; split-by-cluster hashes the cluster unit instead.
    # ``mod`` defaults to the %100 split/slice granularity; fixed-budget
    # SAMPLING gates pass a finer modulus so the draw can stay below 1%
    # of the corpus (the quadratic-truth evals' requirement).
    key = F.col("doc_id") if key is None else key
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )


def _split_col(key: F.Column | None = None) -> F.Column:
    """train/val/test assignment — THE split definition; shared by the
    splitter (sample_hash_split), the leakage audit, and the
    split-by-cluster fix so they can never check different splits."""
    return (
        F.when(_bucket_col(key) < _TRAIN_END, "train")
        .when(_bucket_col(key) < _VAL_END, "val")
        .otherwise("test")
    )


def _sql_bucket(key: str = "doc_id", mod: int = 100) -> str:
    """DuckDB twin of _bucket_col — THE hash-bucket definition in SQL.
    Shared by the split oracles here and by the sampled-eval oracle in
    ``dedup`` so a Spark-side gate and its oracle can never disagree."""
    return (
        f"CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8) AS UBIGINT)"
        f" % {mod}"
    )


def _sql_split_case(key: str = "doc_id") -> str:
    """DuckDB twin of _split_col, shared by the oracles."""
    bucket = _sql_bucket(key)
    return f"""CASE
             WHEN {bucket} < {_TRAIN_END} THEN 'train'
             WHEN {bucket} < {_VAL_END} THEN 'val'
             ELSE 'test'
           END"""


def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by doc_id hash, reported
    as per-split stats. Hash-assignment (vs random()) keeps every row's
    split stable across engines, retries, and data growth."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(_split_col().alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


def sample_hash_split_oracle() -> str:
    return f"""
    SELECT {_sql_split_case()} AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1 ORDER BY 1
    """


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: near-duplicate pairs whose members
    landed in DIFFERENT train/val/test splits. A hash split assigns
    near-dups independently, so ~2·p·(1-p) of duplicate pairs straddle the
    train/eval boundary — exactly the leakage that inflates eval scores.
    This is the check an LLM data pipeline runs after splitting and before
    training; the fix is dedup-then-split or split-by-cluster.

    Plan: the MinHash pair list (bucketed candidate join, not all-pairs)
    joined twice against the doc->split projection — two broadcast-sized
    probes at any scale, since pairs ≪ corpus."""
    from komodo_data_spark.operators.dedup import minhash_pairs_shared

    splits = load_table(spark, sf_dir, "documents").select(
        "doc_id", _split_col().alias("split")
    )
    pairs = minhash_pairs_shared(spark, sf_dir)
    return (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("doc_i"), F.col("split").alias("split_i")
            ),
            "doc_i",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("doc_j"), F.col("split").alias("split_j")
            ),
            "doc_j",
        )
        .filter(F.col("split_i") != F.col("split_j"))
        .select("doc_i", "doc_j", "jaccard", "split_i", "split_j")
        .orderBy("doc_i", "doc_j")
    )


def split_leakage_pairs_oracle() -> str:
    from komodo_data_spark.operators.dedup import dedup_minhash_lsh_oracle

    return f"""
    WITH mh AS ({dedup_minhash_lsh_oracle()}),
    sp AS (SELECT doc_id, {_sql_split_case()} AS split FROM documents)
    SELECT mh.doc_i, mh.doc_j, mh.jaccard,
           si.split AS split_i, sj.split AS split_j
    FROM mh JOIN sp si ON si.doc_id = mh.doc_i
            JOIN sp sj ON sj.doc_id = mh.doc_j
    WHERE si.split <> sj.split
    ORDER BY doc_i, doc_j
    """


def docs_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: the fix ``split_leakage_pairs``'
    docstring prescribes. Every near-dup CLUSTER is assigned wholly to one
    split by hashing its cluster label (singleton docs hash their own
    doc_id), so no near-dup pair can straddle the train/eval boundary.
    One row per split — doc count, unit (cluster-or-singleton) count —
    plus the global leaked-pair count re-measured with the same probe as
    the audit, which is 0 BY CONSTRUCTION and verified, not assumed.

    Scale design: pairs are computed ONCE (cached) and feed both the
    O(log n) large-star/small-star component labeling (`_cc_star`, the
    chain-safe scale path) and the leakage probe; the labels frame covers
    only docs that appear in some pair (≪ corpus), joined to the doc list
    with AQE free to broadcast it; split assignment is then map-side hash
    math. The leakage probe joins the pair list twice against the
    doc→split projection — two broadcast-sized probes at any scale.
    """
    from komodo_data_spark.operators.dedup import minhash_pairs_shared

    # the shared detection is already checkpointed (no per-query cache)
    pairs = minhash_pairs_shared(spark, sf_dir).select("doc_i", "doc_j")
    # one-directional pairs, like the sibling _cc_star callers: the star
    # rounds symmetrize internally, so pre-flipping would only double the
    # rows into the first distinct/shuffle
    labels, _rounds = _cc_star(
        pairs.select(F.col("doc_i").alias("src"), F.col("doc_j").alias("dst"))
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = (
        d.join(labels.select(F.col("node").alias("doc_id"), "label"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("unit"),
        )
        .withColumn("split", _split_col(F.col("unit")))
        # lazy localCheckpoint: GC-released, not a session-lifetime cache
        .localCheckpoint(eager=False)
    )
    leaks = (
        pairs.join(
            assigned.select(
                F.col("doc_id").alias("doc_i"), F.col("split").alias("split_i")
            ),
            "doc_i",
        )
        .join(
            assigned.select(
                F.col("doc_id").alias("doc_j"), F.col("split").alias("split_j")
            ),
            "doc_j",
        )
        .filter(F.col("split_i") != F.col("split_j"))
        .agg(F.count(F.lit(1)).alias("leaked_pairs"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("unit").alias("n_units"),
        )
        .crossJoin(F.broadcast(leaks))
        .orderBy("split")
    )


def docs_split_by_cluster_oracle() -> str:
    from komodo_data_spark.operators.dedup import dedup_minhash_lsh_oracle

    return f"""
    WITH RECURSIVE
    mh AS ({dedup_minhash_lsh_oracle()}),
    pairs AS (SELECT doc_i, doc_j FROM mh),
    edges AS (
      SELECT doc_i AS src, doc_j AS dst FROM pairs
      UNION ALL
      SELECT doc_j, doc_i FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    ),
    lab AS (SELECT node AS doc_id, MIN(label) AS label FROM walk GROUP BY node),
    assigned AS (
      SELECT d.doc_id, coalesce(lab.label, d.doc_id) AS unit,
             {_sql_split_case("coalesce(lab.label, d.doc_id)")} AS split
      FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id
    ),
    leaks AS (
      SELECT COUNT(*) AS leaked_pairs
      FROM pairs p
      JOIN assigned ai ON ai.doc_id = p.doc_i
      JOIN assigned aj ON aj.doc_id = p.doc_j
      WHERE ai.split <> aj.split
    )
    SELECT a.split, COUNT(*) AS n_docs,
           COUNT(DISTINCT a.unit) AS n_units,
           (SELECT leaked_pairs FROM leaks) AS leaked_pairs
    FROM assigned a
    GROUP BY a.split ORDER BY a.split
    """


#: Per-source deterministic sample size (docs_per_source_sample_k).
SAMPLE_K = 20


def docs_per_source_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source deterministic sample: rank each source's docs
    by a salted hash and keep the first SAMPLE_K — the balanced eval-set
    draw (fixed budget per source regardless of source skew), reproducible
    across engines/retries unlike rand()-based sampling.

    One shuffle on source for the rank window; at 100 TB swap the full
    window for the two-stage per-bucket top-k (same move as
    docs_token_budget_mix_twostage) if a single source's row count
    overwhelms a partition — sources are usually few and bounded."""
    d = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= SAMPLE_K)
        .orderBy("source", "rk")
    )


def docs_per_source_sample_k_oracle() -> str:
    return f"""
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {SAMPLE_K}
    ORDER BY source, rk
    """


#: Per-stratum sampling rates (percent) for the stratified sampler: oversample
#: low-resource languages, downsample the head — the canonical corpus
#: rebalancing move.
STRATA_RATES = {"en": 10, "de": 30, "es": 30, "fr": 30, "zh": 50}


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling: keep doc iff its md5 bucket falls
    under the language's rate. Unlike ``df.sampleBy`` (seeded RNG, engine-
    specific, changes under repartition) the hash gate is reproducible
    across engines and stable under data growth — the property a training
    pipeline needs for resumable corpus builds. Pure map-side filter."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in sorted(STRATA_RATES.items())
        ],
        F.lit(0),
    )
    return (
        d.filter(_bucket_col() < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


def stratified_sample_oracle() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in sorted(STRATA_RATES.items())
    )
    return f"""
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 100
          < CASE lang {cases} ELSE 0 END
    GROUP BY lang ORDER BY lang
    """


# --------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis–Spirakis)
# --------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample-without-replacement of K docs, weight = n_chars:
    Efraimidis–Spirakis with a DETERMINISTIC uniform. Each doc gets
    u = (hash32(doc_id)+1)/(2^32+1) ∈ (0,1) and priority -ln(u)/w
    (exponential clock with rate w); the K smallest priorities are exactly
    a weighted sample. Unlike rand()-based sampling the draw is reproducible
    across engines, retries, and repartitions. Map-side priorities + top-k
    (TakeOrdered): no shuffle of the data, only of K candidates per
    partition."""
    d = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    u = (h + 1) / F.lit(4294967297.0)
    priority = -F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", "n_chars", priority.alias("priority"))
        .orderBy("priority")
        .limit(WEIGHTED_SAMPLE_K)
    )


def docs_weighted_sample_oracle() -> str:
    h = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)"
    return f"""
    SELECT doc_id, lang, n_chars,
           -ln(({h} + 1) / 4294967297.0) / n_chars AS priority
    FROM documents
    ORDER BY priority
    LIMIT {WEIGHTED_SAMPLE_K}
    """


# --------------------------------------------------------------------------
# token-budget corpus mixing (per-source caps)
# --------------------------------------------------------------------------

#: Per-source token budgets for the mixing pass; sources not listed get the
#: default. Real pipelines derive these from target mixture weights × total
#: token budget (e.g. up-weight curated sources, cap crawl dumps).
MIX_TOKEN_BUDGETS = {"src0": 3000, "src1": 750, "src2": 0}
MIX_DEFAULT_BUDGET = 1500


def docs_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source token-budget selection — the "mix sources to
    target proportions" step of a training-data build. Docs are ordered
    inside each source by content-independent hash (stable under
    repartition, retries, and appends — the same property as
    sample_hash_split); a running token cumsum admits each doc iff the
    budget was not yet exhausted BEFORE it (greedy prefix, so one doc may
    overshoot but selection never depends on physical row order). Output is
    the per-source audit: docs/tokens admitted vs budget.

    100 TB: one shuffle (hash-partition by source) + per-source window
    cumsum. A mega-source makes that window single-reducer; the scale
    escape is two-stage: approx-quantile the per-source hash at the token
    budget (one pass, mergeable sketch) and broadcast the cutoff hash back
    as a map-side filter — same admitted set whenever the cut lands between
    docs. The window form is the exact reference semantics.
    """
    d = load_table(spark, sf_dir, "documents")
    budget = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(b))
            for s, b in sorted(MIX_TOKEN_BUDGETS.items())
        ],
        F.lit(MIX_DEFAULT_BUDGET),
    )
    d = d.select(
        "doc_id",
        "source",
        budget.alias("budget_tokens"),
        F.size(tokens()).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum_tok", F.sum("n_tok").over(w))
    kept = d.filter(F.col("cum_tok") - F.col("n_tok") < F.col("budget_tokens"))
    return kept.groupBy("source", "budget_tokens").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").alias("n_tokens_kept"),
    )


def docs_token_budget_mix_oracle() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in sorted(MIX_TOKEN_BUDGETS.items())
    )
    t = sql_tokens()
    return f"""
    WITH sized AS (
      SELECT doc_id, source,
             CASE source {cases} ELSE {MIX_DEFAULT_BUDGET} END AS budget_tokens,
             len({t}) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), running AS (
      SELECT *,
             sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum_tok
      FROM sized
    )
    SELECT source, budget_tokens, count(*) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens_kept
    FROM running
    WHERE cum_tok - n_tok < budget_tokens
    GROUP BY source, budget_tokens
    """


def docs_token_budget_mix_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for :func:`docs_token_budget_mix`, admitted-set
    EXACT (same oracle): replace the per-source global ordered window with
    bucketed prefix sums, the docs_surrogate_keys technique applied to a
    budget cut.

    Docs bucket by the first 2 hex chars of their ordering hash (256
    buckets whose lexicographic order refines the doc order). Stage 1
    aggregates token sums per (source, bucket) — distributed, map-side
    combinable. Stage 2 runs the running total over the ≤256-row bucket
    frame (tiny window). Each bucket is then decided wholesale:
    fully-admitted (cum_before + bucket_sum <= budget — no per-doc work at
    all), fully-rejected (cum_before >= budget), or THE boundary bucket,
    where an ordered window runs over ~1/256th of one source. The
    quadratic-free proof: cum_before_doc < budget for every doc of a
    fully-admitted bucket because doc order refines bucket order.
    """
    d = load_table(spark, sf_dir, "documents")
    budget = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(b))
            for s, b in sorted(MIX_TOKEN_BUDGETS.items())
        ],
        F.lit(MIX_DEFAULT_BUDGET),
    )
    sized = d.select(
        "doc_id",
        "source",
        budget.alias("budget_tokens"),
        F.size(tokens()).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    bstats = sized.groupBy("source", "budget_tokens", "bucket").agg(
        F.sum("n_tok").alias("b_sum")
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bstats = bstats.withColumn(
        "cum_before_bucket", F.coalesce(F.sum("b_sum").over(wb), F.lit(0))
    )
    joined = sized.join(F.broadcast(bstats), ["source", "budget_tokens", "bucket"])
    full = joined.filter(
        F.col("cum_before_bucket") + F.col("b_sum") <= F.col("budget_tokens")
    ).select("source", "budget_tokens", "n_tok")
    boundary = joined.filter(
        (F.col("cum_before_bucket") < F.col("budget_tokens"))
        & (F.col("cum_before_bucket") + F.col("b_sum") > F.col("budget_tokens"))
    )
    wd = (
        Window.partitionBy("source", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary_kept = (
        boundary.withColumn(
            "cum_before_doc",
            F.col("cum_before_bucket")
            + F.coalesce(F.sum("n_tok").over(wd), F.lit(0)),
        )
        .filter(F.col("cum_before_doc") < F.col("budget_tokens"))
        .select("source", "budget_tokens", "n_tok")
    )
    return (
        full.unionByName(boundary_kept)
        .groupBy("source", "budget_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tok").alias("n_tokens_kept"),
        )
    )


# --------------------------------------------------------------------------
# curriculum ordering (easy -> hard training schedule)
# --------------------------------------------------------------------------

#: Fixed difficulty cutoffs (mean word length in chars) separating the four
#: curriculum phases — configuration constants like MIX_TOKEN_BUDGETS, set
#: near the corpus quartiles so every phase is populated. Fixed cutoffs
#: (not NTILE) keep phase assignment MAP-SIDE: a quantile-derived phase
#: would need a global CDF pass, and a doc's phase would churn whenever the
#: corpus grows — fixed cutoffs are stable under appends, like the hash
#: split.
CURRICULUM_CUTS = (4.4, 4.5, 4.65)


def docs_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum schedule: every document gets a global
    training rank — easy phases first (phase = fixed difficulty cutoffs on
    mean word length), documents within a phase in a deterministic
    md5-shuffled order (so each phase is content-shuffled, not
    source-clustered, and the order is stable under retries / layout
    changes / appends of later-ranked docs).

    Scale design: the naive form is one GLOBAL ordered window
    (row_number over phase, h) — a single-partition sort at 100 TB. This
    runs the docs_surrogate_keys / twostage-budget technique instead:
    docs bucket by the first 2 hex chars of their shuffle hash; stage 1
    counts per (phase, bucket) — map-side combinable aggregate; stage 2
    computes bucket rank offsets with a window over the <= 4*256-row
    bucket frame (tiny); stage 3 ranks within each (phase, bucket) — a
    PARTITIONED window, ~1/1024th of the corpus per partition. Exact
    because (phase, bucket) lexicographic order refines (phase, h)
    order (bucket is a prefix of h). Oracle = the naive global window.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = tokens()
    difficulty = (
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / F.size(toks)
    )
    c1, c2, c3 = CURRICULUM_CUTS
    phase = (
        F.when(F.col("difficulty") <= c1, F.lit(1))
        .when(F.col("difficulty") <= c2, F.lit(2))
        .when(F.col("difficulty") <= c3, F.lit(3))
        .otherwise(F.lit(4))
    )
    sized = (
        d.select("doc_id", difficulty.alias("difficulty"))
        .withColumn("phase", phase)
        .withColumn(
            "h",
            F.md5(F.concat(F.lit("curriculum|"), F.col("doc_id").cast("string"))),
        )
        .withColumn("bucket", F.substring("h", 1, 2))
    )
    bstats = sized.groupBy("phase", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    wb = Window.orderBy("phase", "bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bstats = bstats.withColumn(
        "offset", F.coalesce(F.sum("n").over(wb), F.lit(0))
    )
    wd = Window.partitionBy("phase", "bucket").orderBy("h", "doc_id")
    return (
        sized.join(F.broadcast(bstats), ["phase", "bucket"])
        .select(
            "doc_id",
            "phase",
            "difficulty",
            (F.col("offset") + F.row_number().over(wd)).alias(
                "curriculum_rank"
            ),
        )
    )


def docs_curriculum_order_oracle() -> str:
    t = sql_tokens()
    c1, c2, c3 = CURRICULUM_CUTS
    return f"""
    WITH d AS (
      SELECT doc_id, {t} AS toks FROM documents WHERE text IS NOT NULL
    ),
    sc AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
               / len(toks) AS difficulty
      FROM d
    ),
    ph AS (
      SELECT doc_id, difficulty,
             CASE WHEN difficulty <= {c1} THEN 1
                  WHEN difficulty <= {c2} THEN 2
                  WHEN difficulty <= {c3} THEN 3
                  ELSE 4 END AS phase,
             md5('curriculum|' || CAST(doc_id AS VARCHAR)) AS h
      FROM sc
    )
    SELECT doc_id, phase, difficulty,
           row_number() OVER (ORDER BY phase, h, doc_id) AS curriculum_rank
    FROM ph
    """


# --------------------------------------------------------------------------
# overlapping document chunking
# --------------------------------------------------------------------------

CHUNK_LEN = 200
CHUNK_STRIDE = 150


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping character chunks (len 200,
    stride 150) — the context-window prep step. Map-side explode: chunk
    starts are sequence(1, length, stride); no shuffle anywhere."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1), F.length("text"), F.lit(CHUNK_STRIDE))
            ).alias("chunk_start"),
        )
        .select(
            "doc_id",
            "chunk_start",
            F.expr(f"substring(text, chunk_start, {CHUNK_LEN})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
        .orderBy("doc_id", "chunk_start")
    )


def doc_chunks_oracle() -> str:
    return f"""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text), {CHUNK_STRIDE})) AS chunk_start
      FROM documents
    )
    SELECT doc_id, chunk_start,
           substr(text, chunk_start, {CHUNK_LEN}) AS chunk_text,
           length(substr(text, chunk_start, {CHUNK_LEN})) AS chunk_len
    FROM starts ORDER BY doc_id, chunk_start
    """


# --------------------------------------------------------------------------
# blocklist term redaction (PII-scrub shape)
# --------------------------------------------------------------------------

# The synthetic corpus has no emails/phones, so the PII-scrub op is
# exercised with a term blocklist; the regex shape (word-boundary
# alternation, global replace) is exactly what an email/phone scrub uses.
_REDACT_PAT = r"\b(customer|supplier|order)\b"


def term_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact blocklisted terms; report per-doc hit count and the redacted
    length. Pure codegen projection (regexp_extract_all + regexp_replace)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit(_REDACT_PAT), 0)
            ).alias("n_hits"),
            F.length(
                F.regexp_replace("text", _REDACT_PAT, "[REDACTED]")
            ).alias("redacted_len"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


def term_redaction_oracle() -> str:
    return rf"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_REDACT_PAT}')) AS n_hits,
           length(regexp_replace(text, '{_REDACT_PAT}', '[REDACTED]', 'g')) AS redacted_len
    FROM documents
    WHERE len(regexp_extract_all(text, '{_REDACT_PAT}')) > 0
    ORDER BY doc_id
    """


# --------------------------------------------------------------------------
# near-dup cluster assignment (connected components over MinHash pairs)
# --------------------------------------------------------------------------

_CC_MAX_ROUNDS = 15


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate pairs (from the MinHash-LSH detector) into
    clusters: connected components by iterative min-label propagation, the
    step a dedup pipeline needs between "pairs" and "keep one per cluster".

    Each round: join labels to the symmetric edge list, take the min label
    seen across self + neighbors, localCheckpoint to cut lineage, stop when
    no label changed. Rounds ≤ component diameter (near-dup components are
    tiny cliques in practice; _CC_MAX_ROUNDS is a safety cap).
    """
    from komodo_data_spark.operators.dedup import minhash_pairs_shared

    # the shared detection is checkpointed, so the symmetric union's two
    # branches read materialized pairs instead of running MinHash twice
    pairs = minhash_pairs_shared(spark, sf_dir).select("doc_i", "doc_j")
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_j").alias("doc_i"), F.col("doc_i").alias("doc_j")
            )
        )
        .withColumnRenamed("doc_i", "src")
        .withColumnRenamed("doc_j", "dst")
        # lazy localCheckpoint: GC-released, not a session-lifetime cache
        .localCheckpoint(eager=False)
    )
    # Round 0 fused into initialization: with label(v) = v initially, one
    # propagation round is exactly min(self, neighbors) — a plain aggregate
    # over the edge list, no join. Cliques (the overwhelming near-dup
    # component shape) are fully labeled here; the loop below only verifies
    # convergence (and finishes diameter>1 stragglers).
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min(F.least("src", "dst")).alias("label"))
        .localCheckpoint()
    )
    for _ in range(_CC_MAX_ROUNDS):
        prop = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label", F.lit(0).alias("is_self"))
        )
        # Fold the convergence check into the same aggregate: each node has
        # exactly one self row, so max(label where is_self) is its old label
        # — no separate old-vs-new join, and the changed-count job only reads
        # the just-checkpointed (tiny) frame.
        stepped = (
            labels.select("node", "label", F.lit(1).alias("is_self"))
            .union(prop)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("is_self") == 1, F.col("label"))).alias(
                    "old_label"
                ),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    w = Window.partitionBy("cluster_id")
    return (
        labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .orderBy("doc_id")
    )


#: Safety cap for the alternating star algorithm: rounds ~ log2(n), so 30
#: covers components far beyond any real corpus; exhausting it means the
#: input violated assumptions and the labels would be WRONG — so raise.
_CC_STAR_MAX_ROUNDS = 30

#: Max adaptive contraction pre-passes before the star rounds (r13): each
#: pass is cheaper than a star round (one agg + one contract join pair vs
#: two agg+join+distinct operators) and halves chain-shaped components;
#: the adaptive shrink test (>= 1.5x per pass) stops it where it stops
#: paying, so a path costs one pass and a clique empties in one.
_CC_CONTRACT_PASSES = 3


def _cc_star(edges: DataFrame, max_rounds: int = _CC_STAR_MAX_ROUNDS):
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of component shape, vs O(diameter) for
    min-label propagation. The scale path for chain-shaped components
    (crawl mirror chains), where a 100 TB corpus can hold paths thousands
    of hops long; dedup_clusters' propagation stays as the cheaper default
    for the clique-shaped components near-dup detection actually emits.

    ``edges``: undirected edge list with columns (src, dst), self-loops
    ignored. Returns ``(labels, rounds)`` where labels is (node, label)
    with label = the component's minimum node id — every node that appears
    in the edge list gets a row.

    Per round both operators are a groupBy-min + equi-join + distinct —
    all shuffle-partitioned on node id, no driver-side state; each round's
    frame is localCheckpointed to cut the iterative lineage. Convergence
    is detected by an order-independent edge-set signature (count +
    bit_xor of xxhash64) — one tiny aggregate per round over the
    just-checkpointed frame.
    """

    def large_star(e: DataFrame) -> DataFrame:
        # connect every neighbor ABOVE u to u's smallest known node.
        # No .distinct() here (r13): every large-star output flows
        # straight into small_star, whose min-aggregate is duplicate-
        # blind and whose own final distinct dedups the round — the
        # removed exchange was one of six per round (guide §2.4).
        sym = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"),
            )
        )

    def small_star(e: DataFrame) -> DataFrame:
        # point every edge downhill, then connect each node's lower
        # neighborhood (and itself) to its minimum
        directed = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = directed.groupBy("u").agg(F.min("v").alias("mn"))
        return (
            directed.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .union(mins.select("u", F.col("mn").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def ckpt_sig(e: DataFrame) -> tuple:
        """Eager localCheckpoint + the round's order-independent edge-set
        signature (count + bit_xor of xxhash64) in ONE materialization:
        the signature rides the checkpoint job as an ``observe`` metric
        (r13), where it used to be a separate aggregate job per round —
        one scheduler wave per star round saved, same values."""
        from pyspark.sql import Observation

        obs = Observation()
        out = e.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return out, (m["n"], m["h"])

    def contract_min(e: DataFrame):
        """One contraction pass: map every node to the minimum of its
        closed neighborhood and contract edges through the mapping.
        Returns (mapping(node, m) — eager checkpoint, contracted edges +
        signature). Component-preserving (the mapping target is always
        in the node's own component; every edge survives as a mapped
        edge or a dropped loop)."""
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mk = (
            sym.groupBy(F.col("u").alias("node"))
            .agg(F.min(F.least("u", "v")).alias("m"))
            .localCheckpoint(eager=True)
        )
        ec, s = ckpt_sig(
            e.join(mk.withColumnRenamed("node", "u"), "u")
            .select(F.col("m").alias("cu"), "v")
            .join(mk.withColumnRenamed("node", "v"), "v")
            .select(F.col("cu").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return mk, ec, s

    e0, sig0 = ckpt_sig(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # CONTRACTION passes before iterating: each collapses every node into
    # the minimum of its closed neighborhood — clique-shaped regions
    # (near-dup components, copresence cliques) shrink to ~1 node in one
    # pass, so the O(log n) star rounds run on a far smaller frame.
    # ADAPTIVE pass count (r13, round-12 verdict ask #5): keep
    # contracting while a pass shrinks the edge set by >= 1.5x, up to
    # _CC_CONTRACT_PASSES — chain-heavy graphs (the copresence graph)
    # keep shrinking ~2x per pass and trade each saved star round (two
    # shuffles + checkpoint) for a cheaper contraction; a pure path
    # shrinks by ~nothing and stops after the first pass, and a clique
    # graph empties immediately (count 0 short-circuits).
    mapping, e, cur = contract_min(e0)
    passes, prev_n = 1, sig0[0]
    while (
        cur[0] > 0
        and passes < _CC_CONTRACT_PASSES
        and cur[0] * 3 <= prev_n * 2
    ):
        mk, e2, s = contract_min(e)
        # compose original->current through the new pass; nodes whose
        # component already fully contracted keep their current target
        mk2 = mk.select(
            F.col("node").alias("_mid"), F.col("m").alias("_m2")
        )
        mapping = (
            mapping.join(mk2, F.col("m") == F.col("_mid"), "left")
            .select("node", F.coalesce("_m2", "m").alias("m"))
            .localCheckpoint(eager=True)
        )
        prev_n, (e, cur) = cur[0], (e2, s)
        passes += 1
    rounds = 0
    # emptiness falls out of the signature count — the old rdd.isEmpty()
    # paid a separate job (plus a DataFrame->RDD conversion) per call
    converged = cur[0] == 0
    while not converged and rounds < max_rounds:
        # NEGATIVE RESULT, kept as a note: folding TWO star pairs into one
        # checkpoint+signature wave did not reduce the job count (AQE
        # stage jobs track SHUFFLES, which stay 2 per star round) and the
        # 2x-deeper per-wave plan cost more driver-side planning than the
        # saved checkpoint/sig jobs (measured 6.8 -> 10.5 s isolated at
        # sf0.1); one star pair per wave is the right grain.
        e2, s = ckpt_sig(small_star(large_star(e)))
        rounds += 1
        e = e2
        if s == cur:
            converged = True
        cur = s
    if not converged:
        raise RuntimeError(
            f"star connected-components did not converge in {max_rounds} rounds"
        )
    # converged edge set is a star forest over CONTRACTED nodes: compose
    # original->contracted->root, then every original node gets a row
    # (roots label themselves)
    stars = e.groupBy(F.col("u").alias("m")).agg(F.min("v").alias("star"))
    labels = mapping.join(stars, "m", "left").select(
        "node", F.coalesce("star", "m").alias("label")
    )
    return labels, rounds


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters' exact twin on the alternating large-star/small-star
    algorithm — identical output (same oracle), O(log n) rounds instead of
    O(diameter), the variant to reach for when components can be long
    chains rather than near-dup cliques."""
    from komodo_data_spark.operators.dedup import minhash_pairs_shared

    pairs = minhash_pairs_shared(spark, sf_dir).select("doc_i", "doc_j")
    labels, _rounds = _cc_star(
        pairs.select(F.col("doc_i").alias("src"), F.col("doc_j").alias("dst"))
    )
    w = Window.partitionBy("cluster_id")
    return (
        labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .orderBy("doc_id")
    )


def dedup_clusters_oracle() -> str:
    from komodo_data_spark.operators.dedup import dedup_minhash_lsh_oracle

    return f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_i, doc_j FROM ({dedup_minhash_lsh_oracle()}) mh),
    edges AS (
      SELECT doc_i AS src, doc_j AS dst FROM pairs
      UNION ALL
      SELECT doc_j, doc_i FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    ),
    lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node)
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM lab ORDER BY doc_id
    """


# --------------------------------------------------------------------------
# deterministic sequence packing (concat-in-order, cut at capacity)
# --------------------------------------------------------------------------

PACK_CAPACITY = 2048

#: Range partitions for the packing cumsum. Like _SK_PARTITIONS this is a
#: parallelism knob, not a correctness knob — at 100 TB raise it to the
#: cluster's task budget; the offset frame stays |langs| × this.
_PACK_PARTITIONS = 8


def token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget bins per language: docs are
    laid end-to-end in doc_id order and cut every PACK_CAPACITY tokens
    (bin = floor(start_offset / capacity)), fully deterministic.

    Scale design: the naive form — ``sum() OVER (PARTITION BY lang ORDER BY
    doc_id)`` — is a single-task-per-language sort: parallelism is capped at
    |langs|, and the English partition of a 100 TB corpus runs on ONE
    executor. This runs the :func:`docs_surrogate_keys` technique on a SUM
    instead of a COUNT: range-partition on (lang, doc_id) — so within a
    lang, every doc of partition p precedes every doc of partition p+1 —
    aggregate token sums per (lang, pid) into a tiny |langs|×|pids| frame,
    prefix-sum that frame with a window (tiny), broadcast the offsets back,
    and cumsum within each (pid, lang) — a PARTITIONED window over 1/Nth of
    the corpus. Exact because (lang, pid, doc_id) order refines
    (lang, doc_id) order under range partitioning on (lang, doc_id).

    The range-partitioned frame is checkpointed eagerly: partition ids must
    be identical in the sum pass and the cumsum pass (two plan branches
    would re-sample range boundaries independently).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("lang", "doc_id", F.size(tokens()).alias("n_tokens"))
        .repartitionByRange(_PACK_PARTITIONS, "lang", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wo = (
        Window.partitionBy("lang")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("lang", "pid")
        .agg(F.sum("n_tokens").alias("p_sum"))
        .withColumn("offset", F.coalesce(F.sum("p_sum").over(wo), F.lit(0)))
        .select("lang", "pid", "offset")
    )
    wd = (
        Window.partitionBy("pid", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = toks.join(F.broadcast(offsets), ["lang", "pid"]).withColumn(
        "bin",
        (
            (F.col("offset") + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0)))
            / F.lit(PACK_CAPACITY)
        ).cast("long"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("lang", "bin")
    )


def token_packing_oracle() -> str:
    t = sql_tokens()
    return f"""
    WITH toks AS (
      SELECT lang, doc_id, len({t}) AS n_tokens FROM documents
    ), binned AS (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR((CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                         - n_tokens) / {PACK_CAPACITY}) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY lang, bin ORDER BY lang, bin
    """


#: Candidate context lengths priced by token_packing_stats. Small enough
#: to explode map-side (3 rows per doc), large enough to bracket the real
#: decision space at the testdata's token scale.
PACK_CANDIDATE_LENS = (64, 256, 1024)


def token_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding/truncation economics per candidate context length — the
    numbers a training pipeline reads before fixing max_seq_len. For each
    candidate L, every document is priced under BOTH standard policies:
    pad-to-boundary (doc split into ceil(n/L) sequences, the last one
    padded: waste = ceil(n/L)·L − n) and truncate-at-L (tokens beyond L
    dropped: loss = max(0, n − L)). Output per L: sequence count, padding
    fraction of the padded token volume, truncation fraction of the raw
    token volume, and the share of docs that overflow one sequence.

    Scale design: pure map work — one tokenize pass, a 3-element explode
    of the candidate list, then ONE map-side-combinable aggregate keyed by
    the |candidates|-row seq_len; no join, no window, no skew (the hot key
    IS the aggregate key, absorbed by partial aggregation).
    """
    # NULL-text docs carry no tokens to pack; dropping them keeps the
    # Spark size() (-1 on null arrays with ANSI off) and the DuckDB len()
    # (NULL) from diverging on degenerate data
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.size(tokens()).alias("n"))
    )
    lens = F.array(*[F.lit(x) for x in PACK_CANDIDATE_LENS])
    per = d.select("n", F.explode(lens).alias("seq_len")).select(
        "seq_len",
        "n",
        F.ceil(F.col("n") / F.col("seq_len")).cast("long").alias("n_seqs"),
        F.greatest(F.col("n") - F.col("seq_len"), F.lit(0)).alias("trunc"),
    )
    return (
        per.groupBy("seq_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum("n_seqs").alias("total_seqs"),
            (
                F.sum(F.col("n_seqs") * F.col("seq_len") - F.col("n"))
                .cast("double")
                / F.sum(F.col("n_seqs") * F.col("seq_len"))
            ).alias("pad_frac"),
            (F.sum("trunc").cast("double") / F.sum("n")).alias("trunc_frac"),
            (
                F.sum(F.when(F.col("n") > F.col("seq_len"), 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("overflow_doc_frac"),
        )
        .orderBy("seq_len")
    )


def token_packing_stats_oracle() -> str:
    t = sql_tokens()
    lens = ", ".join(str(x) for x in PACK_CANDIDATE_LENS)
    return f"""
    WITH d AS (SELECT len({t}) AS n FROM documents WHERE text IS NOT NULL),
    per AS (
      SELECT seq_len, n,
             CAST(CEIL(n::DOUBLE / seq_len) AS BIGINT) AS n_seqs,
             GREATEST(n - seq_len, 0) AS trunc
      FROM d, unnest([{lens}]) AS u(seq_len)
    )
    SELECT seq_len, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(n_seqs) AS BIGINT) AS total_seqs,
           SUM(n_seqs * seq_len - n)::DOUBLE / SUM(n_seqs * seq_len)
             AS pad_frac,
           SUM(trunc)::DOUBLE / SUM(n) AS trunc_frac,
           SUM(CASE WHEN n > seq_len THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)
             AS overflow_doc_frac
    FROM per GROUP BY seq_len ORDER BY seq_len
    """


#: Fixed sequence length for token_packing_sequences. 128 sits BELOW the
#: corpus's typical doc length (~150-250 tokens), so the testdata
#: exercises both packing directions: most docs split across 2+ sequences
#: AND most sequences contain 2+ doc slices (boundary rows).
PACK_SEQ_LEN = 128


def token_packing_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the per-language token stream into fixed-PACK_SEQ_LEN training
    SEQUENCES — the actual batch-prep step ``token_packing`` (which cuts
    BINS and reports per-bin totals) stops short of: every token is
    placed exactly once, long docs split across sequence boundaries, and
    each output row is one doc-slice ``(lang, seq_id, doc_id, start_tok,
    n_toks)`` — the attention-boundary map a sequence assembler consumes
    (round-8 verdict ask #4).

    Semantics: within a language, docs lie end-to-end in doc_id order;
    the stream is cut every PACK_SEQ_LEN tokens; a doc spanning global
    offsets [s, s+n) intersects sequences s div L .. (s+n−1) div L, and
    its slice in sequence q is [max(s, qL), min(s+n, (q+1)L)) —
    start_tok is doc-relative, so (doc_id, start_tok, n_toks) addresses
    the exact token run. All integer arithmetic; zero-token docs emit
    nothing.

    Scale design: the doc start offsets come from the same two-stage
    range-partitioned prefix sum as :func:`token_packing` (per-(lang,pid)
    partials + a tiny broadcast offsets frame — no per-language
    single-task sort at any size); the sequence fan-out is a map-side
    ``explode(sequence(...))`` adding ~total_tokens/L + n_docs rows. No
    shuffle after the offsets window; the output is written
    sequence-ordered per partition, which is exactly the order an
    assembler reads.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = (
        d.select("lang", "doc_id", F.size(tokens()).alias("n_tokens"))
        .repartitionByRange(_PACK_PARTITIONS, "lang", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wo = (
        Window.partitionBy("lang")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("lang", "pid")
        .agg(F.sum("n_tokens").alias("p_sum"))
        .withColumn("offset", F.coalesce(F.sum("p_sum").over(wo), F.lit(0)))
        .select("lang", "pid", "offset")
    )
    wd = (
        Window.partitionBy("pid", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    L = PACK_SEQ_LEN
    started = (
        toks.join(F.broadcast(offsets), ["lang", "pid"])
        .withColumn(
            "s",
            F.col("offset")
            + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0)),
        )
        .filter(F.col("n_tokens") > 0)
    )
    lo = F.greatest(F.col("seq_id") * L, F.col("s"))
    hi = F.least((F.col("seq_id") + 1) * L, F.col("s") + F.col("n_tokens"))
    return (
        started.withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"s div {L}"),
                    F.expr(f"(s + n_tokens - 1) div {L}"),
                )
            ),
        )
        .select(
            "lang",
            "seq_id",
            "doc_id",
            (lo - F.col("s")).alias("start_tok"),
            (hi - lo).alias("n_toks"),
        )
        .orderBy("lang", "seq_id", "doc_id")
    )


def token_packing_sequences_oracle() -> str:
    t = sql_tokens()
    L = PACK_SEQ_LEN
    return f"""
    WITH toks AS (
      SELECT lang, doc_id, len({t}) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ), st AS (
      SELECT lang, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - n_tokens AS s
      FROM toks
    )
    SELECT lang, q AS seq_id, doc_id,
           GREATEST(q * {L}, s) - s AS start_tok,
           LEAST((q + 1) * {L}, s + n_tokens) - GREATEST(q * {L}, s)
             AS n_toks
    FROM st, unnest(range(s // {L}, (s + n_tokens - 1) // {L} + 1)) AS u(q)
    WHERE n_tokens > 0
    ORDER BY lang, seq_id, doc_id
    """


def registry():
    """name -> (query fn, oracle SQL) for the driver contract."""
    return {
        "sample_hash_split": (sample_hash_split, sample_hash_split_oracle()),
        "split_leakage_pairs": (
            split_leakage_pairs,
            split_leakage_pairs_oracle(),
        ),
        "docs_split_by_cluster": (
            docs_split_by_cluster,
            docs_split_by_cluster_oracle(),
        ),
        "docs_stratified_sample": (
            docs_stratified_sample,
            docs_stratified_sample_oracle(),
        ),
        "docs_per_source_sample_k": (
            docs_per_source_sample_k,
            docs_per_source_sample_k_oracle(),
        ),
        "stratified_sample": (stratified_sample, stratified_sample_oracle()),
        "docs_weighted_sample": (
            docs_weighted_sample,
            docs_weighted_sample_oracle(),
        ),
        "docs_token_budget_mix": (
            docs_token_budget_mix,
            docs_token_budget_mix_oracle(),
        ),
        "docs_token_budget_mix_twostage": (
            docs_token_budget_mix_twostage,
            docs_token_budget_mix_oracle(),  # admitted-set exact scale path
        ),
        "docs_curriculum_order": (
            docs_curriculum_order,
            docs_curriculum_order_oracle(),
        ),
        "docs_dsir_weights": (docs_dsir_weights, docs_dsir_weights_oracle()),
        "docs_dsir_resample": (
            docs_dsir_resample,
            docs_dsir_resample_oracle(),
        ),
        "benchmark_contamination_semantic": (
            benchmark_contamination_semantic,
            benchmark_contamination_semantic_oracle(),
        ),
        "doc_chunks": (doc_chunks, doc_chunks_oracle()),
        "term_redaction": (term_redaction, term_redaction_oracle()),
        "dedup_clusters": (dedup_clusters, dedup_clusters_oracle()),
        "dedup_clusters_star": (dedup_clusters_star, dedup_clusters_oracle()),
        "dedup_clusters_best_keeper": (
            dedup_clusters_best_keeper,
            dedup_clusters_best_keeper_oracle(),
        ),
        "token_packing": (token_packing, token_packing_oracle()),
        "token_packing_stats": (
            token_packing_stats,
            token_packing_stats_oracle(),
        ),
        "token_packing_sequences": (
            token_packing_sequences,
            token_packing_sequences_oracle(),
        ),
        "dedup_keep_latest": (dedup_keep_latest, dedup_keep_latest_oracle()),
        "dedup_keep_latest_maxby": (
            dedup_keep_latest_maxby,
            dedup_keep_latest_oracle(),  # same semantics, aggregate plan
        ),
        "incremental_new_docs": (
            incremental_new_docs,
            incremental_new_docs_oracle(),
        ),
        "benchmark_contamination": (
            benchmark_contamination,
            benchmark_contamination_oracle(),
        ),
        "benchmark_contamination_bloom": (
            benchmark_contamination_bloom,
            benchmark_contamination_bloom_oracle(),
        ),
        "text_pii_scan": (text_pii_scan, text_pii_scan_oracle()),
        "text_pii_redact": (text_pii_redact, text_pii_redact_oracle()),
        "docs_domain_stats": (docs_domain_stats, docs_domain_stats_oracle()),
        "docs_temperature_mix": (
            docs_temperature_mix,
            docs_temperature_mix_oracle(),
        ),
        "url_canonical_dedup": (
            url_canonical_dedup,
            url_canonical_dedup_oracle(),
        ),
        "cdc_apply_changes": (cdc_apply_changes, cdc_apply_changes_oracle()),
        "docs_surrogate_keys": (
            docs_surrogate_keys,
            docs_surrogate_keys_oracle(),
        ),
        "customers_pseudonymized": (
            customers_pseudonymized,
            customers_pseudonymized_oracle(),
        ),
        "customers_k_anonymity": (
            customers_k_anonymity,
            customers_k_anonymity_oracle(),
        ),
        "docs_dp_release": (docs_dp_release, docs_dp_release_oracle()),
        "orders_dp_sum_release": (
            orders_dp_sum_release,
            orders_dp_sum_release_oracle(),
        ),
        "events_dp_mean_release": (
            events_dp_mean_release,
            events_dp_mean_release_oracle(),
        ),
        "customers_l_diversity": (
            customers_l_diversity,
            customers_l_diversity_oracle(),
        ),
        "customers_t_closeness": (
            customers_t_closeness,
            customers_t_closeness_oracle(),
        ),
        "customers_t_closeness_emd": (
            customers_t_closeness_emd,
            customers_t_closeness_emd_oracle(),
        ),
        "events_key_skew_profile": (
            events_key_skew_profile,
            events_key_skew_profile_oracle(),
        ),
    }


# --------------------------------------------------------------------------
# keep-latest-per-key dedup (snapshot semantics)
# --------------------------------------------------------------------------


def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per (user_id, event_type) — the "current snapshot per
    key" dedup every recrawled/refreshed corpus needs (keep newest version
    per URL). One window rank per key, ties broken by event_id so the
    answer is deterministic under concurrent timestamps. Single shuffle on
    the key; at scale this is the motivating case for pre-bucketing the
    table by the dedup key so the window runs shuffle-free."""
    from komodo_data_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts_ms", "value")
    )


def dedup_keep_latest_oracle() -> str:
    return """
    SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """


# --------------------------------------------------------------------------
# incremental new-content detection (anti-join on content fingerprint)
# --------------------------------------------------------------------------


def incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose content fingerprint is NOT already in the 'seen' snapshot
    — the incremental-crawl dedup step. The seen set here is the even
    doc_ids' fingerprints (a deterministic stand-in for yesterday's
    corpus); production swaps in the accumulated fingerprint table. Plan:
    left ANTI join on the 32-char md5 — one shuffle each side, no row data
    moves for matches, and the fingerprint table is the only thing the
    history side ever has to store."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "content_fp", F.md5(F.concat_ws(" ", tokens()))
    )
    seen = d.filter(F.col("doc_id") % 2 == 0).select("content_fp")
    return (
        d.join(seen, "content_fp", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang")
    )


def incremental_new_docs_oracle() -> str:
    t = sql_tokens()
    return f"""
    WITH d AS (
      SELECT doc_id, lang, md5(array_to_string({t}, ' ')) AS content_fp
      FROM documents
    ), seen AS (SELECT content_fp FROM d WHERE doc_id % 2 = 0)
    SELECT lang, count(*) AS n_new, min(doc_id) AS min_doc_id
    FROM d ANTI JOIN seen USING (content_fp)
    GROUP BY lang ORDER BY lang
    """


# --------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out set)
# --------------------------------------------------------------------------

_CONTAM_N = 4  # shingle width for contamination matching
_BENCH_MOD = 47  # doc_id % 47 == 0 -> "benchmark" member (deterministic stand-in)


def benchmark_shingles(bench_docs: DataFrame) -> DataFrame:
    """Distinct ``_CONTAM_N``-token shingles of a benchmark document set —
    the ONE definition of what a "benchmark shingle" is, shared by the
    batch scanner (:func:`benchmark_contamination`) and the streaming
    ingestion gate (``streaming/decontamination_gate.py``), so the two
    can never disagree about the match key."""
    from komodo_data_spark.functions.text_features import shingles
    from komodo_data_spark.plans import exploded

    return (
        exploded(
            bench_docs.select(shingles(tokens(), _CONTAM_N).alias("sh")),
            F.col("sh"),
            "s",
        )
        .select("s")
        .distinct()
    )


def contamination_annotate(
    df: DataFrame, bench_sh: DataFrame, row_key: str | None = None
) -> DataFrame:
    """Annotate EVERY row of ``df`` (any schema with a ``text`` column)
    with ``n_shingles`` / ``n_contaminated`` / ``contamination_frac``
    against a (broadcast) benchmark-shingle frame with column ``s`` — the
    shared scoring kernel of the batch scanner and the streaming gate.

    Pass-through contract: one output row per input row, all input
    columns preserved. The hit counts come back through a unique row
    key: ``row_key`` when the caller GUARANTEES that column unique and
    non-null (the batch scanner's doc_id), else a synthetic id — never a
    blind doc_id re-join, which would multiply duplicate doc_ids within
    a batch and silently drop NULL-keyed rows (the compression-gate
    review finding applies here too).

    The synthetic-id path localCheckpoints ``df`` first:
    ``monotonically_increasing_id`` is only stable across the
    corpus/hits subtrees when the rows below it are materialized — above
    a live round-robin exchange (``load_spread``) the two subtrees can
    see different row orders and the hits would join back to the WRONG
    rows (caught by the DuckDB oracle when this kernel was introduced).

    Scale: benchmark sets are tiny next to the corpus, so ``bench_sh``
    is broadcast and the corpus explode side never shuffles for the
    probe; the only shuffles are the groupBy/join on the unique row key
    (high-cardinality, skew-free by construction).
    """
    from komodo_data_spark.functions.text_features import shingles
    from komodo_data_spark.plans import exploded

    if row_key is None:
        df = df.localCheckpoint(eager=True)
        base = df.withColumn("__uid", F.monotonically_increasing_id())
    else:
        base = df.withColumn("__uid", F.col(row_key))
    base = base.withColumn("__sh", shingles(tokens(), _CONTAM_N))
    corpus = base.withColumn("n_shingles", F.size("__sh"))
    hits = (
        exploded(corpus.select("__uid", "__sh"), F.col("__sh"), "s", "__uid")
        .join(F.broadcast(bench_sh.select("s")), "s")
        .groupBy("__uid")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        corpus.drop("__sh")
        .join(hits, "__uid", "left")
        .drop("__uid")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn(
            "contamination_frac",
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_contaminated").cast("double") / F.col("n_shingles"),
            ).otherwise(F.lit(0.0)),
        )
    )


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination against a benchmark set: the fraction of a
    training document's distinct 4-token shingles that also appear in any
    benchmark document (the standard n-gram decontamination check run
    before training, cf. the public GPT-3 / Gopher appendix method).

    The benchmark membership here is the deterministic stand-in
    ``doc_id % 47 == 0``; production swaps in the real eval-set shingle
    table.

    Scale design: benchmark sets are tiny relative to the corpus (a few
    thousand eval documents vs billions of training docs), so the distinct
    benchmark-shingle set is **broadcast** — the corpus side never
    shuffles for the probe. Scoring goes through the shared
    :func:`contamination_annotate` kernel (ONE definition with the
    streaming ingestion gate, ``streaming/decontamination_gate.py``).
    """
    from komodo_data_spark.sources.tables import load_spread

    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    bench_sh = benchmark_shingles(d.filter(F.col("doc_id") % _BENCH_MOD == 0))
    corpus = d.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return contamination_annotate(corpus, bench_sh, row_key="doc_id").select(
        "doc_id", "n_shingles", "n_contaminated", "contamination_frac"
    )


def benchmark_contamination_oracle() -> str:
    from komodo_data_spark.functions.text_features import sql_shingles

    sh = sql_shingles(sql_tokens(), _CONTAM_N)
    return f"""
    WITH d AS (SELECT doc_id, {sh} AS sh FROM documents),
    bench AS (
      SELECT DISTINCT s FROM d, unnest(d.sh) AS u(s)
      WHERE doc_id % {_BENCH_MOD} = 0
    ),
    corpus AS (
      SELECT doc_id, len(sh) AS n_shingles, sh FROM d
      WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    hits AS (
      SELECT c.doc_id, count(*) AS n_contaminated
      FROM corpus c, unnest(c.sh) AS u(s)
      JOIN bench USING (s)
      GROUP BY c.doc_id
    )
    SELECT c.doc_id, c.n_shingles,
      coalesce(h.n_contaminated, 0) AS n_contaminated,
      CASE WHEN c.n_shingles > 0
        THEN coalesce(h.n_contaminated, 0)::DOUBLE / c.n_shingles
        ELSE 0.0::DOUBLE END AS contamination_frac
    FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
    """


#: Bloom sizing for the beyond-broadcast decontamination path: bits per
#: benchmark shingle and hash-function count. m/n = 16 with k = 4 probes
#: gives a ~0.24% false-positive rate — false positives only cost exact-
#: join work on a few extra rows, never correctness (the exact semi-join
#: decides membership).
DECONTAM_BLOOM_BITS_PER_KEY = 16
DECONTAM_BLOOM_K = 4

#: Target bits per bloom BUCKET row (8 KB of words). The round-8 design
#: was one row holding the whole bitset, built by a driver-side
#: collect_list: at a 100M-shingle eval union that is a ~200 MB single
#: array — past Spark's broadcast comfort zone and a single-row
#: serialization chokepoint. Bucketing keeps the same total bits and the
#: same FP math (keys hash uniformly to buckets, each bucket keeps
#: ~BITS_PER_KEY bits per key) in B small rows that broadcast and build
#: as ordinary aggregates.
BLOOM_BUCKET_BITS = 1 << 16

#: Seed for the bucket-routing hash — any constant outside the probe
#: seeds 0..DECONTAM_BLOOM_K-1, so bucket choice is independent of the
#: in-bucket bit positions.
_BLOOM_BUCKET_SEED = 101


def _bloom_geometry(n_keys: int) -> tuple[int, int]:
    """(n_buckets, bits_per_bucket) for a key count: total bits
    ~ BITS_PER_KEY·n spread over max(8, total/BUCKET_BITS) buckets (the
    floor keeps the plan structurally bucketed at test scale), per-bucket
    bits a multiple of 64. The word index cast to INT in the probe is
    guarded here (advice r8: the flat design could overflow element_at's
    INT index past ~2^37 total bits — per-bucket bits are bounded by
    construction, and the assert keeps it that way)."""
    total = max(1 << 16, DECONTAM_BLOOM_BITS_PER_KEY * n_keys)
    n_buckets = max(8, -(-total // BLOOM_BUCKET_BITS))
    bits_per = max(64, (-(-total // n_buckets // 64)) * 64)
    assert bits_per // 64 <= (1 << 31) - 2, bits_per
    return n_buckets, bits_per


def bloom_fit(keys: DataFrame, key_col: str, n_keys: int) -> DataFrame:
    """BUCKETED Bloom filter frame — one row per bucket
    ``(bkt, bf: array<long>)`` of bits_per_bucket/64 words — over a key
    column: the broadcastable bitset Spark's internal ``bloom_filter_agg``
    would build (that expression is not registered as a public function
    in 4.1, so this is the same semantics from public expressions: a
    bucket-routing xxhash64 + k in-bucket xxhash64 positions per key,
    word-wise ``bit_or(shiftleft())``). Fit cost is one explode + one
    map-side-combinable aggregate to B·bits_per/64 (bkt, word) rows, then
    a per-BUCKET dense-array assembly (map lookup over a static word-index
    sequence) — no driver-side single-row collect, no row larger than
    ~BLOOM_BUCKET_BITS/8 bytes at any key count."""
    n_buckets, bits_per = _bloom_geometry(n_keys)
    n_words = bits_per // 64
    pos = keys.select(
        F.pmod(
            F.xxhash64(F.col(key_col), F.lit(_BLOOM_BUCKET_SEED)),
            F.lit(n_buckets),
        ).alias("bkt"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(key_col), F.lit(k)), F.lit(bits_per)
                    )
                    for k in range(DECONTAM_BLOOM_K)
                ]
            )
        ).alias("p"),
    )
    wr = (
        pos.select(
            "bkt",
            F.expr("p div 64").alias("w"),
            F.expr("CAST(p % 64 AS INT)").alias("b"),
        )
        .groupBy("bkt", "w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("word"))
    )
    return (
        wr.groupBy("bkt")
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("word")
            ).alias("wm")
        )
        .select(
            "bkt",
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1)),
                # try_element_at: ANSI element_at throws on absent map
                # keys, and most word slots of a sparse bucket are absent
                lambda i: F.coalesce(
                    F.try_element_at("wm", i), F.lit(0).cast("long")
                ),
            ).alias("bf"),
        )
    )


def benchmark_contamination_bloom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Beyond-broadcast twin of :func:`benchmark_contamination` — same
    output, same oracle. The baseline broadcasts the DISTINCT benchmark
    shingle set; a full eval-suite union at production scale can exceed
    the broadcast ceiling. This path broadcasts only a BLOOM FILTER of
    the shingles (16 bits/key — 2 MB per million shingles, two orders
    smaller than the strings), prefilters the corpus shingle explode
    MAP-SIDE with it, and runs the exact semi-join (shuffle-hash, NOT
    broadcast — the point of the twin) only on the survivors: the
    corpus-sized explode never reaches an exchange; what shuffles is
    hits plus the bloom's ~0.24% false positives.

    The filter is BUCKETED (round-8 verdict ask #5): keys route to
    max(8, total_bits/2^16) buckets by an independent xxhash64, each
    bucket holding its own ~16-bits-per-key word array, and the probe is
    a broadcast equi-join on the bucket key followed by the k in-bucket
    bit tests. Same FP math as a flat bitset, but no single-row
    array<long> ceiling: the round-8 design built ONE row holding all
    total_bits/64 words via a driver-side collect_list — ~200 MB at a
    100M-shingle eval union — where the bucket rows stay ~8 KB each at
    any key count and assemble as ordinary per-bucket aggregates.

    Measured candidate reduction at sf0.1 (bucketed: 6,115 keys -> 8
    buckets x 12,288 bits): 249,562 exploded corpus shingles -> 2,667
    survivors entering the exact join (94× fewer rows shuffled; 2,122
    true hits + 545 false positives = 0.22% of misses, matching the
    predicted 0.24% for m/n=16, k=4); output hash-identical to the
    broadcast path at sf0.001/0.01/0.1.

    Scale notes: the bloom is fit with one map-side-combinable aggregate
    (``bloom_fit``) and sized from one column-pruned count, so its
    false-positive rate is constant at any benchmark size; the exact
    semi-join stays skew-free (shingle keys, post-filter volume ~ true
    hits). The two driver-side scalars (shingle count; nothing else) are
    control-plane, same as the recall evals' slice sizing."""
    from komodo_data_spark.functions.text_features import shingles
    from komodo_data_spark.plans import exploded
    from komodo_data_spark.sources.tables import load_spread

    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    bench_sh = benchmark_shingles(
        d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    ).localCheckpoint(eager=True)  # consumed by the fit AND the exact join
    n_keys = bench_sh.count()
    n_buckets, bits_per = _bloom_geometry(n_keys)
    bf = bloom_fit(bench_sh, "s", n_keys).localCheckpoint(eager=True)

    corpus = (
        d.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .withColumn("__sh", shingles(tokens(), _CONTAM_N))
    )
    ex = (
        exploded(
            corpus.select("doc_id", "__sh"), F.col("__sh"), "s", "doc_id"
        )
        .withColumn(
            "bkt",
            F.pmod(
                F.xxhash64(F.col("s"), F.lit(_BLOOM_BUCKET_SEED)),
                F.lit(n_buckets),
            ),
        )
        # broadcast equi-join on the bucket key; a probe whose bucket got
        # no keys has no row to join — the inner join dropping it IS the
        # correct negative answer (bloom of the empty set)
        .join(F.broadcast(bf), "bkt")
    )
    for k in range(DECONTAM_BLOOM_K):
        ex = ex.withColumn(
            f"_p{k}", F.pmod(F.xxhash64(F.col("s"), F.lit(k)), F.lit(bits_per))
        )
    might = F.lit(True)
    for k in range(DECONTAM_BLOOM_K):
        might = might & (
            F.expr(
                f"element_at(bf, CAST(_p{k} div 64 AS INT) + 1) "
                f"& shiftleft(CAST(1 AS BIGINT), CAST(_p{k} % 64 AS INT))"
            )
            != 0
        )
    survivors = ex.filter(might).select("doc_id", "s")
    hits = (
        survivors.join(bench_sh.hint("shuffle_hash"), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        corpus.select("doc_id", F.size("__sh").alias("n_shingles"))
        .join(hits, "doc_id", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn(
            "contamination_frac",
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_contaminated").cast("double") / F.col("n_shingles"),
            ).otherwise(F.lit(0.0)),
        )
    )


def benchmark_contamination_bloom_oracle() -> str:
    # Identical contract to the broadcast path: the bloom is a pure
    # prefilter (false positives are removed by the exact semi-join), so
    # the independent check IS the baseline oracle.
    return benchmark_contamination_oracle()


def benchmark_contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: a training vector is
    contaminated when its max cosine against ANY benchmark vector clears
    the near-dup threshold — the semantic complement of the 4-gram
    ``benchmark_contamination`` above, catching the paraphrased /
    re-worded eval leakage that n-gram overlap misses (cf. the public
    discussion of paraphrase contamination around open eval suites).
    Benchmark membership reuses the same deterministic stand-in
    (``vec_id % 47 == 0``); production swaps in the real eval-set
    embedding table.

    Scale design: the benchmark set is tiny vs the corpus (thousands of
    eval items vs billions of training vectors), so it collapses to ONE
    row of (vector, norm) structs that is crossJoin-broadcast to every
    corpus row; the similarity loop runs as JVM higher-order lambdas
    inside whole-stage codegen — zero Python, zero corpus shuffle, the
    map-only shape every 100 TB cleaning pass wants. If the benchmark
    ever outgrows per-row lambdas, the swap is the shared BLAS
    mapInPandas kernel (``dedup._matmul_hits``) over the same broadcast.
    """
    from komodo_data_spark.operators.dedup import COSINE_THRESHOLD

    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform("e", lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
        )
    )
    bench = v.filter(F.col("vec_id") % _BENCH_MOD == 0).agg(
        F.collect_list(
            F.struct(F.col("e").alias("be"), F.col("nrm").alias("bn"))
        ).alias("bs")
    )
    corpus = v.filter(F.col("vec_id") % _BENCH_MOD != 0)

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _sim(s):
        # zero-norm vectors cannot be "near" anything: NULL via nullif,
        # skipped by array_max (mirrors the oracle's NULLIF)
        return _dot(F.col("e"), s["be"]) / F.nullif(
            F.col("nrm") * s["bn"], F.lit(0.0)
        )

    return (
        corpus.crossJoin(F.broadcast(bench))
        .select(
            "vec_id",
            F.array_max(F.transform("bs", _sim)).alias("max_benchmark_cosine"),
        )
        .withColumn(
            "contaminated",
            F.coalesce(
                F.col("max_benchmark_cosine") >= F.lit(COSINE_THRESHOLD),
                F.lit(False),
            ),
        )
        .orderBy("vec_id")
    )


def benchmark_contamination_semantic_oracle() -> str:
    from komodo_data_spark.operators.dedup import COSINE_THRESHOLD

    dot = (
        "list_sum(list_transform(range(1, len(c.e)+1), i -> c.e[i] * b.e[i]))"
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    bench AS (SELECT * FROM v WHERE vec_id % {_BENCH_MOD} = 0),
    corpus AS (SELECT * FROM v WHERE vec_id % {_BENCH_MOD} <> 0),
    sims AS (
      SELECT c.vec_id,
             max({dot} / NULLIF(c.nrm * b.nrm, 0)) AS mx
      FROM corpus c CROSS JOIN bench b
      GROUP BY c.vec_id
    )
    SELECT c.vec_id, s.mx AS max_benchmark_cosine,
           coalesce(s.mx >= {COSINE_THRESHOLD}, FALSE) AS contaminated
    FROM corpus c LEFT JOIN sims s USING (vec_id)
    ORDER BY c.vec_id
    """


# --------------------------------------------------------------------------
# URL canonicalization + keep-first dedup
# --------------------------------------------------------------------------


def _synthetic_url_col() -> F.Column:
    """Deterministic URL fixture derived from (source, doc_id), with the
    classic crawl noise baked in: tracking params, trailing slash, mixed
    host case, explicit default port. Shared by ``url_canonical_dedup``
    and ``docs_domain_stats`` so their fixtures can never drift."""
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.com:443/docs/"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&ref=rss"))
        .when(F.col("doc_id") % 3 == 1, F.lit("/"))
        .otherwise(F.lit("")),
    )


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize URL variants and keep one document per canonical URL —
    the crawl-dedup step that runs before any content hashing.

    The testdata has no URL column, so a synthetic ``url`` is derived
    deterministically from (source, doc_id) *including the classic noise*:
    tracking query params on some rows, a trailing slash on others, mixed
    host case. The operator body — the normalization chain and the
    keep-first-per-canonical-URL dedup — is the real product:

    - lowercase scheme+host, strip ``utm_*``/``ref`` tracking params,
      drop trailing slash, collapse the default port.
    - keep the smallest doc_id per canonical URL (deterministic winner),
      count the variants folded into it.

    Scale: normalization is pure projection (codegen regexp); dedup is one
    shuffle on canonical_url (high cardinality, no skew) with a min/count
    aggregate — no window, no sort.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url_col().alias("url")
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("url")), r"\?(utm_[a-z]+|ref)=[^?]*$", ""),
            r":443/",
            "/",
        ),
        r"/$",
        "",
    )
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            (F.count(F.lit(1)) - 1).alias("n_dups_folded"),
        )
    )


def url_canonical_dedup_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, {_SYNTHETIC_URL_SQL} AS url
      FROM documents
    )
    SELECT
      regexp_replace(regexp_replace(regexp_replace(lower(url),
        '\\?(utm_[a-z]+|ref)=[^?]*$', ''), ':443/', '/'), '/$', '')
        AS canonical_url,
      min(doc_id) AS kept_doc_id,
      count(*) - 1 AS n_dups_folded
    FROM d
    GROUP BY 1
    """


# --------------------------------------------------------------------------
# CDC apply-changes (insert/update/delete log -> current snapshot)
# --------------------------------------------------------------------------

_CDC_OPS = {"view": "I", "click": "U", "purchase": "D"}


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the current snapshot from a change log: latest change
    per key wins; a terminal delete removes the key. This is the batch
    CDC-apply that complements ``sources/merge.py`` (which upserts full
    rows without deletes).

    The change log here is derived deterministically from events
    (view→insert, click→update, purchase→delete, ordered by (ts_ms,
    event_id)); production feeds a real CDC stream. Plan: one window over
    the key (single shuffle), rank to the latest change, filter deletes —
    no join at all. At 100 TB the shuffle carries one row per change, and
    swapping the window for a max_by aggregate keeps it map-side
    combinable if change logs are append-heavy.
    """
    from komodo_data_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin(*_CDC_OPS.keys())
    )
    op = F.element_at(
        F.create_map(*[F.lit(x) for k, v in _CDC_OPS.items() for x in (k, v)]),
        F.col("event_type"),
    )
    log = ev.select(
        "user_id",
        op.alias("op"),
        "ts_ms",
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", "op", F.col("ts_ms").alias("as_of_ms"), "value")
        .orderBy("user_id")
    )


def cdc_apply_changes_oracle() -> str:
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _CDC_OPS.items())
    return f"""
    WITH log AS (
      SELECT user_id, CASE event_type {cases} END AS op,
             epoch_ms(ts) AS ts_ms, event_id, value
      FROM events
      WHERE event_type IN ({", ".join(repr(k) for k in _CDC_OPS)})
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC
      ) AS rn
      FROM log
    )
    SELECT user_id, op, ts_ms AS as_of_ms, value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """


# --------------------------------------------------------------------------
# distributed surrogate-key assignment (global ordinals, no global sort task)
# --------------------------------------------------------------------------

_SK_PARTITIONS = 8


def docs_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign dense sequential ids 1..N in doc_id order — WITHOUT the
    single-task trap. ``row_number() OVER (ORDER BY doc_id)`` forces every
    row through ONE partition; instead: range-partition on the key (global
    order across partitions), count rows per partition, prefix-sum those
    counts into per-partition offsets (a tiny driver-size frame), broadcast
    them back, and rank within each partition. Every stage is bounded by a
    partition, so the same plan assigns ordinals to 100 TB.

    The partitioned frame is checkpointed eagerly: partition ids must be
    identical in the count pass and the rank pass (two plan branches would
    re-sample range boundaries independently).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .repartitionByRange(_SK_PARTITIONS, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wc = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("offset", F.coalesce(F.sum("n").over(wc), F.lit(0)))
        .select("pid", "offset")
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    return (
        d.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "lang",
            (F.col("offset") + F.row_number().over(w)).alias("sk"),
        )
        .orderBy("doc_id")
    )


def docs_surrogate_keys_oracle() -> str:
    return """
    SELECT doc_id, lang,
           row_number() OVER (ORDER BY doc_id) AS sk
    FROM documents ORDER BY doc_id
    """


def dedup_keep_latest_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by twin of :func:`dedup_keep_latest`: the latest row per key as
    a plain AGGREGATE (``max_by(payload_struct, ordering_struct)``) instead
    of a window rank.

    Why it matters at 100 TB: the aggregate form is map-side combinable —
    each task reduces its partition to one candidate per key BEFORE the
    shuffle, so the exchange carries |keys| rows, while the window form
    shuffles EVERY row and then sorts each partition. Same deterministic
    tie-break (lexicographic struct ordering on (ts, event_id)). The
    window form wins only when you need more than rank-1.
    """
    from komodo_data_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    latest = F.max_by(
        F.struct("event_id", "ts_ms", "value"),
        F.struct("ts", "event_id"),
    ).alias("latest")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(latest)
        .select(
            "user_id",
            "event_type",
            "latest.event_id",
            "latest.ts_ms",
            "latest.value",
        )
    )


# --------------------------------------------------------------------------
# PII pseudonymization + join-key skew profiling
# --------------------------------------------------------------------------


def customers_pseudonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII pseudonymization: replace the name with a salted
    sha256 token that stays JOINABLE (same input -> same token across tables
    and runs) while being non-reversible without the salt — the standard
    privacy gate before training-data export.

    Pure map-side projection (zero shuffle, codegen sha256); the salt would
    come from a secret store in production and is a fixed literal here so
    the oracle can mirror it.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(F.concat(F.lit("kds-salt-v1|"), F.col("c_name")), 256).alias(
            "name_token"
        ),
        "c_nationkey",
        "c_mktsegment",
    )


def customers_pseudonymized_oracle() -> str:
    return """
    SELECT c_custkey, sha256('kds-salt-v1|' || c_name) AS name_token,
           c_nationkey, c_mktsegment
    FROM customer
    """


def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for ``events.user_id``: per-key counts
    re-aggregated into the numbers that decide a join strategy — key count,
    max/avg key frequency, the hot key's share of all rows, and how many
    keys exceed 2x the mean (salting candidates).

    Two cheap aggregations: the first shuffles one combined count per key
    (map-side partial), the second collapses |keys| rows to one summary
    row. This is the measurement feeding join_strategies'
    orders_customer_join_salted: skew_ratio >> 1 says salt; ~1 says a
    plain hash join is fine.
    """
    ev = load_events(spark, sf_dir).select("user_id")
    # Checkpointed: both the summary agg and the hot-key count branch from
    # it, and a lazy plan would re-run the events groupBy per branch.
    per_key = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    mean_df = per_key.agg(F.avg("cnt").alias("mean_cnt"))
    hot = (
        per_key.crossJoin(F.broadcast(mean_df))
        .agg(
            F.sum(
                F.when(F.col("cnt") > F.lit(2.0) * F.col("mean_cnt"), 1).otherwise(0)
            ).alias("n_hot_keys")
        )
    )
    summary = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        (F.sum("cnt") / F.count(F.lit(1))).alias("avg_key_rows"),
        (F.max("cnt") / F.sum("cnt")).cast("double").alias("top_key_share"),
    )
    return summary.crossJoin(hot)


def events_key_skew_profile_oracle() -> str:
    return """
    WITH per_key AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           max(cnt) AS max_key_rows,
           sum(cnt) / count(*) AS avg_key_rows,
           CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_key_share,
           CAST(sum(CASE WHEN cnt > 2.0 * (SELECT avg(cnt) FROM per_key)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys
    FROM per_key
    """


def dedup_clusters_best_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper selection per near-dup cluster by QUALITY, not by id: real
    pipelines keep the best-written member of each duplicate cluster (the
    longest/cleanest crawl of a page), falling back to lowest doc_id only
    on ties. Composes the connected components with the heuristic quality
    score; selection is one window rank over the tiny cluster frame —
    the event stream never re-shuffles.
    """
    clusters = dedup_clusters(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").withColumn("toks", tokens())
    n_tok = F.size("toks")
    ttr = F.size(F.array_distinct("toks")).cast("double") / n_tok
    quality = F.least(n_tok / F.lit(100.0), F.lit(1.0)) * (0.5 + 0.5 * ttr)
    j = clusters.join(
        d.select("doc_id", quality.alias("quality")), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            "cluster_size",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("quality").alias("keeper_quality"),
        )
    )


def dedup_clusters_best_keeper_oracle() -> str:
    t = sql_tokens()
    return f"""
    WITH c AS ({dedup_clusters_oracle()}),
    q AS (
      SELECT doc_id,
             least(len(toks) / 100.0, 1.0)
               * (0.5 + 0.5 * (len(list_distinct(toks))::DOUBLE / len(toks)))
               AS quality
      FROM (SELECT doc_id, {t} AS toks FROM documents)
    ),
    j AS (
      SELECT c.cluster_id, c.cluster_size, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id) AS rn
      FROM c JOIN q USING (doc_id)
    )
    SELECT cluster_id, cluster_size, doc_id AS keeper_doc_id,
           quality AS keeper_quality
    FROM j WHERE rn = 1
    """


# --------------------------------------------------------------------------
# PII detection + redaction (emails / phone numbers / IPv4 addresses)
# --------------------------------------------------------------------------
#
# The synthetic testdata text contains no real PII, so a deterministic
# ``pii_text`` column is derived from (text, doc_id) with the three classic
# PII shapes injected on a doc_id-keyed schedule — the same fixture pattern
# as ``url_canonical_dedup``'s synthetic URL. The OPERATOR — the pattern
# bank, the scan, and the typed-placeholder redaction — is the real
# product; production swaps the fixture for the raw crawl text.
#
# Patterns are written to the Java-regex / RE2 common subset (no
# lookaround, no backreferences) so the Spark body and the DuckDB oracle
# compile the same automaton.

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
_PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def _pii_text_col() -> F.Column:
    """Deterministic PII-bearing text fixture (Spark side)."""
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                F.lit(" call 555-"),
                F.lpad(((F.col("doc_id") * 37) % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((F.col("doc_id") * 91) % 10000).cast("string"), 4, "0"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit(" from host 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 254 + 1).cast("string"),
            ),
        )
        .otherwise(F.lit("")),
    )


_PII_TEXT_SQL = """
      text || CASE
        WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com'
        WHEN doc_id % 5 = 1 THEN ' call 555-'
          || lpad(CAST((doc_id * 37) % 1000 AS VARCHAR), 3, '0') || '-'
          || lpad(CAST((doc_id * 91) % 10000 AS VARCHAR), 4, '0')
        WHEN doc_id % 5 = 2 THEN ' from host 10.'
          || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.'
          || (doc_id % 254 + 1)
        ELSE '' END
"""


def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII hit counts (emails / phones / IPv4) — the scan half
    of the detect-then-redact stage every training-data pipeline runs
    before release (cf. the public C4 / Dolma / FineWeb pipelines).

    Scale: pure whole-stage-codegen projection (three regexp_extract_all
    calls per row, zero Python, zero shuffle before the deterministic
    output sort); at 100 TB this is a map-only pass that rides the same
    scan as the rest of the cleaning stack.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _pii_text_col().alias("t")
    )
    n_emails = F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), 0))
    n_phones = F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), 0))
    n_ips = F.size(F.regexp_extract_all("t", F.lit(_PII_IPV4), 0))
    return (
        d.select(
            "doc_id",
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
            n_ips.alias("n_ips"),
        )
        .filter(F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0)
        .orderBy("doc_id")
    )


def text_pii_scan_oracle() -> str:
    return rf"""
    WITH d AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones,
           len(regexp_extract_all(t, '{_PII_IPV4}')) AS n_ips
    FROM d
    WHERE len(regexp_extract_all(t, '{_PII_EMAIL}'))
        + len(regexp_extract_all(t, '{_PII_PHONE}'))
        + len(regexp_extract_all(t, '{_PII_IPV4}')) > 0
    ORDER BY doc_id
    """


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-placeholder PII redaction: emails -> ``[EMAIL]``, phones ->
    ``[PHONE]``, IPv4 -> ``[IP]``; emits the total redaction count and the
    md5 of the redacted text so the full rewritten corpus is value-checked
    without shipping megabyte rows through the comparator.

    Scale: same map-only shape as the scan — three chained codegen
    regexp_replace calls; the redacted corpus would be written back through
    the partitioned append sink in production.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _pii_text_col().alias("t")
    )
    n_hits = (
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), 0))
        + F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), 0))
        + F.size(F.regexp_extract_all("t", F.lit(_PII_IPV4), 0))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE,
            "[PHONE]",
        ),
        _PII_IPV4,
        "[IP]",
    )
    return (
        d.select(
            "doc_id",
            n_hits.alias("n_redactions"),
            F.md5(redacted).alias("redacted_md5"),
            F.length(redacted).alias("redacted_len"),
        )
        .filter(F.col("n_redactions") > 0)
        .orderBy("doc_id")
    )


def text_pii_redact_oracle() -> str:
    return rf"""
    WITH d AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents),
    r AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{_PII_EMAIL}'))
               + len(regexp_extract_all(t, '{_PII_PHONE}'))
               + len(regexp_extract_all(t, '{_PII_IPV4}')) AS n_redactions,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                 '{_PII_PHONE}', '[PHONE]', 'g'),
               '{_PII_IPV4}', '[IP]', 'g') AS redacted
      FROM d
    )
    SELECT doc_id, n_redactions, md5(redacted) AS redacted_md5,
           length(redacted) AS redacted_len
    FROM r WHERE n_redactions > 0 ORDER BY doc_id
    """


# --------------------------------------------------------------------------
# per-domain crawl stats (host extraction over the canonical-URL fixture)
# --------------------------------------------------------------------------


def docs_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl statistics — doc count, tracking-param share,
    distinct path count, total chars — the aggregate a crawl-curation pass
    uses to pick domain-level keep/drop/cap decisions before any content
    processing. Reuses ``url_canonical_dedup``'s synthetic URL fixture.

    Scale: host/path extraction is codegen projection; the exact distinct
    path count is computed as two explicit COMBINABLE aggregates — groupBy
    (host, path) first, then groupBy(host) — never a countDistinct, whose
    two-phase distinct rewrite would shuffle one row per page for a real
    crawl (paths are ~unique per page). Both stages map-side combine, so a
    hot domain's per-page rows collapse to per-(host, path) partials in
    stage one and one partial per task in stage two.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _synthetic_url_col().alias("url")
    )
    low = F.lower(F.col("url"))
    host = F.regexp_extract(low, r"^[a-z]+://([^/:]+)", 1)
    path = F.regexp_extract(low, r"^[a-z]+://[^/]+(/[^?]*)", 1)
    per_path = (
        d.select(
            host.alias("host"),
            path.alias("path"),
            low.contains("utm_").cast("int").alias("tracked"),
            "n_chars",
        )
        .groupBy("host", "path")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tracked").alias("n_tracked"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    return (
        per_path.groupBy("host")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tracked").alias("n_tracked"),
            F.count(F.lit(1)).alias("n_paths"),
            F.sum("sum_chars").alias("sum_chars"),
        )
        .orderBy("host")
    )


#: DuckDB twin of ``_synthetic_url_col`` (raw mixed-case form) — ONE
#: definition shared by every oracle touching the URL fixture (mirrors the
#: _PII_TEXT_SQL pattern), so the fixtures cannot drift between oracles.
_SYNTHETIC_URL_SQL = """
      'HTTPS://WWW.' || source || '.Example.com:443/docs/'
        || (doc_id % 40)
        || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=rss'
                WHEN doc_id % 3 = 1 THEN '/' ELSE '' END
"""


def docs_domain_stats_oracle() -> str:
    # strpos, not LIKE '%utm_%': LIKE's '_' is a single-char wildcard, so it
    # would also match 'utmX' (e.g. a host containing 'autumn').
    return f"""
    WITH d AS (
      SELECT doc_id, n_chars, lower({_SYNTHETIC_URL_SQL}) AS url
      FROM documents
    )
    SELECT regexp_extract(url, '^[a-z]+://([^/:]+)', 1) AS host,
           count(*) AS n_docs,
           sum(CASE WHEN strpos(url, 'utm_') > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_tracked,
           count(DISTINCT regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1))::BIGINT
             AS n_paths,
           sum(n_chars)::BIGINT AS sum_chars
    FROM d GROUP BY 1 ORDER BY 1
    """


# --------------------------------------------------------------------------
# temperature-scaled source mixing (alpha-sampling)
# --------------------------------------------------------------------------

TEMP_ALPHA = 0.3  # the published multilingual-LM default (p_i^alpha)
TEMP_BUDGET_TOKENS = 50_000  # target mixture size the weights allocate


def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights: raw token share
    ``p_i = n_i / N`` flattened to ``q_i ∝ p_i^alpha`` (alpha < 1 boosts
    low-resource sources, the standard multilingual/source-mixing scheme
    from the public mT5 / XLM-R recipes), plus each source's token
    allocation under a fixed mixture budget. Complements the hard
    per-source budget caps of ``docs_token_budget_mix``: that op answers
    "which documents fit", this one answers "what should the sampling
    distribution BE".

    Scale: one corpus aggregate (groupBy source, map-side combined) — the
    token counting never leaves the scan stage; the temperature math runs
    on the |sources|-row collapsed frame where the unpartitioned windows
    are single-task and free.
    """
    return temperature_weights(
        per_source_token_counts(load_table(spark, sf_dir, "documents"))
    )


def per_source_token_counts(docs: DataFrame) -> DataFrame:
    """(source, n_tokens) sums — the OTHER half of the mix computation,
    shared by the batch operator and the incremental counter store's
    per-batch fold so the tokenization/aggregation cannot drift either."""
    return (
        docs.select("source", F.size(tokens()).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tokens"))
    )


def temperature_weights(per_src: DataFrame) -> DataFrame:
    """Temperature math over a (source, n_tokens) frame — ONE definition
    shared by the batch operator and the incremental counter-store reader
    (streaming/mix_incremental.py), so the two paths cannot drift."""
    w = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    scaled = per_src.select(
        "source", "n_tokens", p.alias("p_raw"), F.pow(p, TEMP_ALPHA).alias("s")
    )
    q = F.col("s") / F.sum("s").over(w)
    return (
        scaled.select(
            "source",
            "n_tokens",
            "p_raw",
            q.alias("q_temp"),
            (q / F.col("p_raw")).alias("boost"),
            (q * TEMP_BUDGET_TOKENS).alias("alloc_tokens"),
        )
        .orderBy("source")
    )


def docs_temperature_mix_oracle() -> str:
    t = sql_tokens()
    return f"""
    WITH per_src AS (
      SELECT source, sum(len({t}))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, n_tokens,
             n_tokens::DOUBLE / sum(n_tokens) OVER () AS p_raw
      FROM per_src
    ),
    s AS (SELECT *, pow(p_raw, {TEMP_ALPHA}) AS s FROM p)
    SELECT source, n_tokens, p_raw,
           s / sum(s) OVER () AS q_temp,
           (s / sum(s) OVER ()) / p_raw AS boost,
           (s / sum(s) OVER ()) * {TEMP_BUDGET_TOKENS} AS alloc_tokens
    FROM s ORDER BY source
    """


# --------------------------------------------------------------------------
# k-anonymity audit (privacy risk before export)
# --------------------------------------------------------------------------

K_ANON = 5  #: groups smaller than this are re-identification risks

#: The quasi-identifier tuple. ONE definition shared by the batch audit
#: below and the streaming release gate (streaming/k_anonymity_gate.py) —
#: the shared-kernel rule every gate/scanner pair in this repo follows
#: (PII, compression, decontamination): the two sides cannot disagree
#: about a record's equivalence class by construction.
QI_COLS = ("c_nationkey", "c_mktsegment", "bal_band")


def qi_classes(customers: DataFrame) -> DataFrame:
    """Project customer rows to their quasi-identifier class columns
    (generalizing the balance to a 1000-unit band — raw balances would
    make every row its own class). Pure map-side projection."""
    return customers.withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    )


def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation, market
    segment, account-balance band): the privacy check that runs AFTER
    pseudonymization (customers_pseudonymized) and BEFORE export — hashing
    the name does nothing if the remaining attributes single someone out.
    Each QI equivalence class reports its size, the per-record
    re-identification probability (1/size), and whether it falls below the
    K_ANON floor; the export gate suppresses or generalizes flagged groups.

    Scale: one map-side-combinable hash aggregate over the QI tuple; output
    is bounded by the QI domain (|nations| x |segments| x |bands|), never by
    row count. The balance band IS the generalization step — auditing raw
    balances would make every row its own class.
    """
    c = load_table(spark, sf_dir, "customer")
    qi = qi_classes(c).select(*QI_COLS)
    return qi.groupBy(*QI_COLS).agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.lit(1.0) / F.count(F.lit(1))).alias("reident_prob"),
        (F.count(F.lit(1)) < K_ANON).alias("below_k"),
    )


def customers_k_anonymity_oracle() -> str:
    return f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
           count(*) AS class_size,
           1.0E0 / count(*) AS reident_prob,
           count(*) < {K_ANON} AS below_k
    FROM customer
    GROUP BY 1, 2, 3
    """


#: l-diversity floor: a QI class must contain at least this many DISTINCT
#: sensitive values. The l-diversity QI is COARSER than QI_COLS — the
#: sensitive attribute (market segment) is excluded from the key, because
#: an attribute cannot be both quasi-identifier and secret.
L_DIVERSITY = 3
LDIV_QI = ("c_nationkey", "bal_band")


def customers_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.): per QI class (nation,
    balance band), how many DISTINCT market-segment values it contains
    and the entropy of that distribution. k-anonymity alone is defeated
    by the homogeneity attack — a class of 50 records all in the same
    segment re-identifies nobody yet still discloses every member's
    segment — so the export gate needs BOTH audits: class size >= k
    (``customers_k_anonymity``) and distinct sensitive values >= l
    (this). Entropy is the strictness upgrade (entropy l-diversity):
    ln(l) of a uniform class, near 0 when one value dominates even if
    l values technically appear.

    Scale: two chained map-side-combinable hash aggregates — corpus →
    (QI, segment) counts → per-QI rollup; output bounded by the QI
    domain × nothing (the segment dimension folds into the rollup).
    Entropy assembles from Σn·ln(n) and the class size in one pass:
    H = ln(S) − Σ n·ln n / S.
    """
    c = qi_classes(load_table(spark, sf_dir, "customer")).select(
        *LDIV_QI, "c_mktsegment"
    )
    per = c.groupBy(*LDIV_QI, "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    size = F.sum("n")
    return (
        per.groupBy(*LDIV_QI)
        .agg(
            size.alias("class_size"),
            F.count(F.lit(1)).alias("n_distinct_sensitive"),
            (
                F.log(size.cast("double"))
                - F.sum(F.col("n") * F.log(F.col("n").cast("double")))
                / size.cast("double")
            ).alias("sensitive_entropy"),
            (F.count(F.lit(1)) < L_DIVERSITY).alias("below_l"),
        )
        .orderBy(*LDIV_QI)
    )


def customers_l_diversity_oracle() -> str:
    return f"""
    WITH per AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT)
               AS bal_band,
             c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, bal_band,
           CAST(sum(n) AS BIGINT) AS class_size,
           count(*) AS n_distinct_sensitive,
           ln(sum(n)::DOUBLE) - sum(n * ln(n::DOUBLE)) / sum(n)::DOUBLE
             AS sensitive_entropy,
           count(*) < {L_DIVERSITY} AS below_l
    FROM per GROUP BY 1, 2 ORDER BY 1, 2
    """


#: t-closeness ceiling: a QI class whose sensitive-value distribution sits
#: further than this (total variation) from the GLOBAL distribution leaks
#: attribute information even when it is k-anonymous and l-diverse (a
#: class can hold 3 distinct segments yet be 90% one segment that is 20%
#: globally — skewness attack). 0.2 is the conventional audit ceiling.
T_CLOSENESS = 0.2


def customers_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007) — the third rung of the privacy
    ladder after ``customers_k_anonymity`` (class size) and
    ``customers_l_diversity`` (distinct sensitive values): per QI class
    (nation, balance band), the TOTAL VARIATION distance between the
    class's market-segment distribution and the global one. l-diversity
    is defeated by the skewness attack — a class with l distinct values
    still discloses plenty when its mix diverges wildly from the
    population's — so the export gate reads all three audits.

    Exactness: the distance is assembled from INTEGER counts end to end —
    TV = (Σ_present |n_s·N − g_s·S| + (N − Σ_present g_s)·S) / (2·S·N),
    where the second numerator term folds in every segment ABSENT from
    the class (|0 − g_s/N| mass) without densifying — and performs ONE
    double divide at the end, so both engines compare identical doubles
    (the weighted-quantile/micro-nat lesson: never rank engine-assembled
    float sums).

    Scale: one map-side-combinable hash aggregate corpus → (QI, segment)
    counts; the global distribution derives from THAT tiny frame (sum
    over classes — no second corpus pass) and joins back broadcast; the
    per-class windows/rollups run on the QI-domain-bounded frame, never
    the corpus.
    """
    c = qi_classes(load_table(spark, sf_dir, "customer")).select(
        *LDIV_QI, "c_mktsegment"
    )
    per = c.groupBy(*LDIV_QI, "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    glob = (
        per.groupBy("c_mktsegment")
        .agg(F.sum("n").alias("g"))
        # NB: named gtot, not N — Spark resolves case-insensitively and
        # `N` would collide with the per-class count column `n`
        .withColumn("gtot", F.sum("g").over(Window.partitionBy()))
    )
    ws = Window.partitionBy(*LDIV_QI)
    joined = per.join(F.broadcast(glob), "c_mktsegment").withColumn(
        "cls", F.sum("n").over(ws)
    )
    num = F.sum(F.abs(F.col("n") * F.col("gtot") - F.col("g") * F.col("cls")))
    absent = (F.max("gtot") - F.sum("g")) * F.max("cls")
    denom = (F.lit(2) * F.max("cls") * F.max("gtot")).cast("double")
    return (
        joined.groupBy(*LDIV_QI)
        .agg(
            F.max("cls").alias("class_size"),
            ((num + absent).cast("double") / denom).alias("tv_distance"),
        )
        .withColumn("above_t", F.col("tv_distance") > T_CLOSENESS)
        .orderBy(*LDIV_QI)
    )


def customers_t_closeness_oracle() -> str:
    return f"""
    WITH per AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT)
               AS bal_band,
             c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    gdist AS (
      SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS g,
             CAST(sum(sum(n)) OVER () AS BIGINT) AS gtot
      FROM per GROUP BY 1
    ),
    j AS (
      SELECT per.*, g, gtot,
             CAST(sum(n) OVER (PARTITION BY c_nationkey, bal_band)
                  AS BIGINT) AS cls
      FROM per JOIN gdist USING (c_mktsegment)
    )
    SELECT c_nationkey, bal_band,
           max(cls) AS class_size,
           (sum(abs(n * gtot - g * cls)) + (max(gtot) - sum(g)) * max(cls))::DOUBLE
             / (2 * max(cls) * max(gtot))::DOUBLE AS tv_distance,
           (sum(abs(n * gtot - g * cls)) + (max(gtot) - sum(g)) * max(cls))::DOUBLE
             / (2 * max(cls) * max(gtot))::DOUBLE > {T_CLOSENESS} AS above_t
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
    """


def customers_t_closeness_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness with the EARTH MOVER'S DISTANCE over an ORDERED
    sensitive attribute (Li et al. 2007, §4.2) — the companion of
    :func:`customers_t_closeness`, which uses total variation for the
    categorical sensitive attribute. Here the roles swap: QI = (nation,
    market segment), sensitive = the ordered balance BAND, and the
    distance respects adjacency — a class whose balances sit one band
    away from the global mix leaks far less than one concentrated at the
    extreme, which total variation cannot distinguish.

    For ordered values v_1..v_m, EMD = Σ_i |Σ_{j<=i}(p_j − q_j)| / (m−1).
    Assembled integer-exactly like the TV audit: cumulative numerators
    Σ_{j<=i}(n_j·gtot − g_j·cls) over a DENSIFIED (class × band) frame
    (absent bands carry n_j = 0 but still contribute their cumulative
    term — that is why this one densifies where TV folded absence in
    algebraically), one double divide by ((m−1)·cls·gtot) at the end.

    Scale: one corpus-sized hash aggregate to (QI, band) counts; the
    band spine, class sizes, and the densifying cross join all live on
    QI-domain-bounded frames (|nations|·|segments| × |bands|), never the
    corpus; the cumulative window partitions by class over those tiny
    rows.
    """
    per = (
        qi_classes(load_table(spark, sf_dir, "customer"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gband = (
        per.groupBy("bal_band")
        .agg(F.sum("n").alias("g"))
        .withColumn("gtot", F.sum("g").over(Window.partitionBy()))
        .withColumn("nb", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    classes = per.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").alias("cls")
    )
    dense = (
        classes.crossJoin(F.broadcast(gband))
        .join(per, ["c_nationkey", "c_mktsegment", "bal_band"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0).cast("long")))
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bal_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn(
        "cum_d",
        F.sum(F.col("n") * F.col("gtot") - F.col("g") * F.col("cls")).over(wc),
    )
    denom = (
        (F.max("nb") - 1) * F.max("cls") * F.max("gtot")
    ).cast("double")
    emd = F.when(
        F.max("nb") > 1, F.sum(F.abs("cum_d")).cast("double") / denom
    ).otherwise(F.lit(0.0))
    return (
        cum.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("cls").alias("class_size"),
            emd.alias("emd_distance"),
        )
        .withColumn("above_t", F.col("emd_distance") > T_CLOSENESS)
        .orderBy("c_nationkey", "c_mktsegment")
    )


def customers_t_closeness_emd_oracle() -> str:
    return f"""
    WITH per AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    gband AS (
      SELECT bal_band, CAST(sum(n) AS BIGINT) AS g,
             CAST(sum(sum(n)) OVER () AS BIGINT) AS gtot,
             count(*) OVER () AS nb
      FROM per GROUP BY 1
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment, CAST(sum(n) AS BIGINT) AS cls
      FROM per GROUP BY 1, 2
    ),
    dense AS (
      SELECT c.c_nationkey, c.c_mktsegment, b.bal_band, b.g, b.gtot,
             b.nb, c.cls, coalesce(p.n, 0) AS n
      FROM classes c CROSS JOIN gband b
      LEFT JOIN per p ON p.c_nationkey = c.c_nationkey
        AND p.c_mktsegment = c.c_mktsegment AND p.bal_band = b.bal_band
    ),
    cum AS (
      SELECT *, CAST(sum(n * gtot - g * cls) OVER (
               PARTITION BY c_nationkey, c_mktsegment ORDER BY bal_band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_d
      FROM dense
    )
    SELECT c_nationkey, c_mktsegment,
           max(cls) AS class_size,
           CASE WHEN max(nb) > 1 THEN
             sum(abs(cum_d))::DOUBLE
               / ((max(nb) - 1) * max(cls) * max(gtot))::DOUBLE
           ELSE 0.0E0 END AS emd_distance,
           CASE WHEN max(nb) > 1 THEN
             sum(abs(cum_d))::DOUBLE
               / ((max(nb) - 1) * max(cls) * max(gtot))::DOUBLE
           ELSE 0.0E0 END > {T_CLOSENESS} AS above_t
    FROM cum GROUP BY 1, 2 ORDER BY 1, 2
    """


# --------------------------------------------------------------------------
# Differentially-private histogram release
# --------------------------------------------------------------------------

#: Privacy budget for the released (source, lang) histogram. Each document
#: contributes to exactly ONE cell, so the histogram's L1 sensitivity is 1
#: and Laplace(1/epsilon) noise per cell gives epsilon-DP for the whole
#: release (parallel composition).
DP_EPSILON = 1.0

#: Bits of the md5 used as the Laplace inverse-CDF's uniform. 52 = double's
#: mantissa, so the integer -> double conversion is exact.
_DP_UNIFORM_BITS = 52


def _dp_laplace_noise(
    cell_key: F.Column,
    scale: float | None = None,
    salt: str | None = None,
) -> F.Column:
    """Deterministic Laplace(1/DP_EPSILON) noise for a histogram cell,
    derived from the cell key by inverse-CDF over an md5-uniform: the
    engine-portable stand-in for a seeded RNG (same construction as the
    repo's other hash-randomness: Gumbel keys in the DSIR sampler,
    hash-bucket splits). u = (h + 0.5)/2^52 - 0.5 lies strictly inside
    (-0.5, 0.5) — the +0.5 both centers the lattice and makes the ln
    argument provably nonzero — and noise = -(1/eps)·sign(u)·ln(1-2|u|)
    is the textbook Laplace inverse CDF.

    ``salt=None`` (the default) keeps the draw a pure function of the
    PUBLIC cell key: re-running the release never spends extra budget
    (the answer is always the same one draw), but any consumer can
    recompute the draw and invert the release — the shipped guarantee is
    release MECHANICS (noise-then-clamp, never post-processing true
    counts), not cryptographic DP, and the epsilon column is nominal.
    Passing a SECRET ``salt`` (mixed into the md5 ahead of the key) is
    the cryptographic upgrade: the uniform becomes unpredictable to
    anyone without the salt, so the Laplace guarantee holds against
    outside consumers while determinism (and the no-budget re-release
    property) is preserved for the salt holder. The three release ops
    thread this knob through so production use is one config away; the
    registry/oracle path pins the salt-free draws.
    """
    salted = (
        cell_key
        if salt is None
        else F.concat(F.lit(salt), F.lit("\x1f"), cell_key)
    )
    h = F.conv(
        F.substring(F.md5(salted), 1, _DP_UNIFORM_BITS // 4), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << _DP_UNIFORM_BITS)) - F.lit(0.5)
    return (
        F.lit(-(1.0 / DP_EPSILON if scale is None else scale))
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )


#: Declared PUBLIC release domain for the composition histogram. The DP
#: guarantee of ``docs_dp_release`` is over THIS fixed grid, not over the
#: data-derived support: releasing only non-empty cells would leak the
#: exact true support set (under add/remove adjacency, a cell whose single
#: record is the affected individual appears/disappears deterministically —
#: unbounded loss; round-9 ADVICE). Densifying to the declared grid with
#: noisy zeros makes cell PRESENCE data-independent, so parallel
#: composition over cells genuinely gives epsilon-DP for the whole
#: release. Records outside the grid are dropped from the release (the
#: public domain defines what is published); production swaps in its own
#: declared domain.
DP_PUBLIC_SOURCES: tuple = tuple(f"src{i}" for i in range(20))
DP_PUBLIC_LANGS: tuple = ("de", "en", "es", "fr", "zh")


def docs_dp_release(
    spark: SparkSession, sf_dir: str, salt: str | None = None
) -> DataFrame:
    """epsilon-differentially-private release of the corpus composition
    histogram — documents per (source, lang) over the DECLARED public
    grid ``DP_PUBLIC_SOURCES x DP_PUBLIC_LANGS`` with Laplace noise,
    rounded and clamped at zero. The last rung of the privacy ladder
    (``customers_k_anonymity`` -> ``customers_l_diversity`` ->
    ``customers_t_closeness`` -> DP): the earlier audits *measure*
    re-identification risk of a release; this one *mechanically bounds* it
    for the most common data-sheet artifact, the composition table.

    Every grid cell is released — empty cells get Laplace(1/eps) noise
    around zero — so the released support set carries no information
    about the true support (see ``DP_PUBLIC_SOURCES``); ``salt`` is the
    cryptographic-draw knob (see ``_dp_laplace_noise``).

    Scale design: one map-side-combinable count aggregate over the corpus;
    the densify is a left join of the 100-row literal grid against the
    tiny histogram frame; the noise is a per-CELL codegen'd expression on
    that frame, so the release costs exactly one shuffle regardless of
    corpus size. Rounding to integers is part of the mechanism
    (geometric-ish release), clamping at 0 is post-processing and
    therefore free under DP.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.filter(
            F.col("source").isin(list(DP_PUBLIC_SOURCES))
            & F.col("lang").isin(list(DP_PUBLIC_LANGS))
        )
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # literal-array explode, not createDataFrame: the 100-row grid stays a
    # JVM-side codegen'd plan (a Python-RDD grid measured ~2 s of one-time
    # py4j/serialization cost per cold call in the bench)
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(s) for s in DP_PUBLIC_SOURCES])
            ).alias("source")
        )
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.array(*[F.lit(lg) for lg in DP_PUBLIC_LANGS])
                ).alias("lang")
            )
        )
    )
    dense = grid.join(counts, ["source", "lang"], "left").select(
        "source", "lang", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    key = F.concat(
        F.lit("dp|"), F.col("source"), F.lit("|"), F.col("lang")
    )
    return dense.select(
        "source",
        "lang",
        F.greatest(
            F.round(F.col("n") + _dp_laplace_noise(key, salt=salt), 0),
            F.lit(0.0),
        )
        .cast("long")
        .alias("n_released"),
        F.lit(float(DP_EPSILON)).alias("epsilon"),
    ).orderBy("source", "lang")


#: Per-record contribution clamp for the noisy-SUM release: one order's
#: clamped total price. The clamp is what BOUNDS the query's sensitivity —
#: without it one outlier order would force unbounded noise; C is chosen
#: above TPC-H's o_totalprice ceiling (~600k at any SF), so on this data
#: the clamp is a no-op and the mechanism is still formally epsilon-DP.
DP_SUM_CLAMP = 600_000.0


def orders_dp_sum_release(
    spark: SparkSession, sf_dir: str, salt: str | None = None
) -> DataFrame:
    """epsilon-DP noisy SUM — total order revenue per order priority,
    released with Laplace(C/epsilon) noise after clamping every order's
    contribution to [0, C]. The second mechanism rung after the COUNT
    histogram (``docs_dp_release``): sums have unbounded sensitivity
    until each record's contribution is clamped, and the clamp-then-noise
    order is the entire correctness of the mechanism (clamping the noisy
    result instead would be post-processing a non-private value).

    Scale design: the clamp is a codegen'd scalar on the scan; the sum is
    one map-side-combinable aggregate — IN DECIMAL(18,2), which keeps the
    corpus-scale accumulation exact (and engine-order-independent: a
    double sum's value depends on hash-partition visit order, the
    round-8 lesson behind every exact-sum op here); the noise is one
    expression per released row on the |priorities|-row frame.
    """
    o = load_table(spark, sf_dir, "orders")
    clamped = F.least(
        F.greatest(F.col("o_totalprice"), F.lit(0.0)),
        F.lit(DP_SUM_CLAMP),
    ).cast("decimal(18,2)")
    sums = o.groupBy("o_orderpriority").agg(
        F.sum(clamped).alias("s")
    )
    key = F.concat(
        F.lit("dpsum|"), F.coalesce(F.col("o_orderpriority"), F.lit(""))
    )
    return sums.select(
        "o_orderpriority",
        (
            F.col("s").cast("double")
            + _dp_laplace_noise(
                key, scale=DP_SUM_CLAMP / DP_EPSILON, salt=salt
            )
        ).alias("sum_released"),
        F.lit(float(DP_EPSILON)).alias("epsilon"),
        F.lit(DP_SUM_CLAMP).alias("clamp"),
    ).orderBy("o_orderpriority")


def orders_dp_sum_release_oracle() -> str:
    two52 = float(1 << _DP_UNIFORM_BITS)
    hexd = _DP_UNIFORM_BITS // 4
    return f"""
    WITH sums AS (
      SELECT o_orderpriority,
             sum(CAST(least(greatest(o_totalprice, 0.0), {DP_SUM_CLAMP})
                      AS DECIMAL(18,2))) AS s
      FROM orders GROUP BY o_orderpriority
    ),
    keyed AS (
      SELECT o_orderpriority, s,
             (CAST(CAST('0x' || substr(md5(
                'dpsum|' || coalesce(o_orderpriority, '')
              ), 1, {hexd}) AS UBIGINT) AS DOUBLE) + 0.5) / {two52} - 0.5
               AS u
      FROM sums
    )
    SELECT o_orderpriority,
           s::DOUBLE + {-(DP_SUM_CLAMP / DP_EPSILON)!r}::DOUBLE
             * sign(u) * ln(1.0 - 2.0 * abs(u)) AS sum_released,
           {float(DP_EPSILON)} AS epsilon,
           {DP_SUM_CLAMP!r} AS clamp
    FROM keyed
    ORDER BY o_orderpriority
    """


def events_dp_mean_release(
    spark: SparkSession, sf_dir: str, salt: str | None = None
) -> DataFrame:
    """epsilon-DP noisy MEAN — average event value per event_type, built
    from the two released primitives with the budget SPLIT between them:
    a clamped noisy sum at epsilon/2 and a noisy count at epsilon/2, then
    the ratio (post-processing, free). The third mechanism rung after
    COUNT (``docs_dp_release``) and SUM (``orders_dp_sum_release``):
    means are ratios of two sensitive quantities, and sequential
    composition — not a fresh budget per numerator and denominator — is
    what keeps the whole release at epsilon.

    The value clamp reuses the engine's histogram domain
    ([_HIST_LO, _HIST_HI] from events_analytics) so the audit surfaces
    agree about what "the value range" is. The denominator is clamped at
    1 after noising (post-processing) so the ratio is always defined.

    Scale: one decimal-exact sum + count aggregate over the corpus; the
    noise is two expressions per released row on the |types|-row frame.
    """
    from komodo_data_spark.operators.events_analytics import (
        _HIST_HI,
        _HIST_LO,
    )
    from komodo_data_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    clamped = F.least(
        F.greatest(F.col("value"), F.lit(_HIST_LO)), F.lit(_HIST_HI)
    ).cast("decimal(18,6)")
    g = ev.groupBy("event_type").agg(
        F.sum(clamped).alias("s"), F.count(F.lit(1)).alias("n")
    )
    key_s = F.concat(
        F.lit("dpmean_s|"), F.coalesce(F.col("event_type"), F.lit(""))
    )
    key_n = F.concat(
        F.lit("dpmean_n|"), F.coalesce(F.col("event_type"), F.lit(""))
    )
    half = DP_EPSILON / 2.0
    # Per-record sum sensitivity for contributions clamped to
    # [_HIST_LO, _HIST_HI] under add/remove adjacency is
    # max(|LO|, |HI|) — NOT _HIST_HI, which only coincides while the
    # imported histogram domain keeps a nonnegative lower bound. Computed
    # from both bounds so a future negative _HIST_LO cannot silently
    # under-noise the release (round-9 ADVICE); the oracle shares the
    # same Python-computed scale.
    sum_sens = max(abs(_HIST_LO), abs(_HIST_HI))
    noisy_s = F.col("s").cast("double") + _dp_laplace_noise(
        key_s, scale=sum_sens / half, salt=salt
    )
    noisy_n = F.greatest(
        F.col("n") + _dp_laplace_noise(key_n, scale=1.0 / half, salt=salt),
        F.lit(1.0),
    )
    return g.select(
        "event_type",
        (noisy_s / noisy_n).alias("mean_released"),
        F.lit(float(DP_EPSILON)).alias("epsilon"),
    ).orderBy("event_type")


def events_dp_mean_release_oracle() -> str:
    two52 = float(1 << _DP_UNIFORM_BITS)
    hexd = _DP_UNIFORM_BITS // 4
    from komodo_data_spark.operators.events_analytics import (
        _HIST_HI,
        _HIST_LO,
    )

    half = DP_EPSILON / 2.0
    sum_sens = max(abs(_HIST_LO), abs(_HIST_HI))

    def u_of(prefix: str) -> str:
        return (
            f"(CAST(CAST('0x' || substr(md5("
            f"'{prefix}|' || coalesce(event_type, '')"
            f"), 1, {hexd}) AS UBIGINT) AS DOUBLE) + 0.5) / {two52} - 0.5"
        )

    return f"""
    WITH g AS (
      SELECT event_type,
             sum(CAST(least(greatest(value, {_HIST_LO!r}), {_HIST_HI!r})
                      AS DECIMAL(18,6))) AS s,
             count(*) AS n
      FROM events GROUP BY event_type
    ),
    keyed AS (
      SELECT event_type, s, n,
             {u_of("dpmean_s")} AS us,
             {u_of("dpmean_n")} AS un
      FROM g
    )
    SELECT event_type,
           (s::DOUBLE + {-(sum_sens / half)!r}::DOUBLE
              * sign(us) * ln(1.0 - 2.0 * abs(us)))
           / greatest(n + {-(1.0 / half)!r}::DOUBLE
              * sign(un) * ln(1.0 - 2.0 * abs(un)), 1.0) AS mean_released,
           {float(DP_EPSILON)} AS epsilon
    FROM keyed
    ORDER BY event_type
    """


def docs_dp_release_oracle() -> str:
    two52 = float(1 << _DP_UNIFORM_BITS)
    hexd = _DP_UNIFORM_BITS // 4
    srcs = ", ".join(f"('{s}')" for s in DP_PUBLIC_SOURCES)
    langs = ", ".join(f"('{lg}')" for lg in DP_PUBLIC_LANGS)
    return f"""
    WITH raw AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY source, lang
    ),
    grid AS (
      SELECT s.source, l.lang
      FROM (VALUES {srcs}) s(source)
      CROSS JOIN (VALUES {langs}) l(lang)
    ),
    counts AS (
      SELECT g.source, g.lang, coalesce(r.n, 0) AS n
      FROM grid g LEFT JOIN raw r
        ON r.source = g.source AND r.lang = g.lang
    ),
    keyed AS (
      SELECT source, lang, n,
             (CAST(CAST('0x' || substr(md5(
                'dp|' || source || '|' || lang
              ), 1, {hexd}) AS UBIGINT) AS DOUBLE) + 0.5) / {two52} - 0.5
               AS u
      FROM counts
    )
    SELECT source, lang,
           CAST(greatest(
             round(n + {-1.0 / DP_EPSILON} * sign(u) * ln(1.0 - 2.0 * abs(u))),
             0.0
           ) AS BIGINT) AS n_released,
           {float(DP_EPSILON)} AS epsilon
    FROM keyed
    ORDER BY source, lang
    """


# --------------------------------------------------------------------------
# DSIR-style importance resampling (hashed n-gram data selection)
# --------------------------------------------------------------------------

DSIR_TARGET_SOURCE = "src0"  # the "high-quality target domain" stand-in
DSIR_BUCKETS = 256  # hashed-unigram feature buckets (2 md5 hex chars)
DSIR_ALPHA = 0.5  # add-alpha smoothing for both bag-of-buckets models
DSIR_SAMPLE_K = 100  # Gumbel-top-K sample size


def _dsir_bucket(tok: F.Column) -> F.Column:
    """Hashed-unigram feature bucket (0..DSIR_BUCKETS-1) — THE bucket
    definition, shared by the model fit, the batch scorer, and the
    streaming ingestion gate (``streaming/dsir_gate.py``) so the three
    can never hash a token differently."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 2), 16, 10).cast("long").alias("b")
    )


def dsir_fit_llr(docs: DataFrame) -> DataFrame:
    """Fit the DSIR log-likelihood-ratio model from a corpus snapshot:
    target (source == DSIR_TARGET_SOURCE) vs raw bag-of-hashed-unigram
    models, add-alpha smoothed, returned as the (b, llr) table — ≤
    DSIR_BUCKETS rows regardless of corpus size, so consumers always
    broadcast it. ONE definition shared by the batch scorer and the
    streaming gate's model-store publisher.

    Both models ride ONE map-side-combinable groupBy over the token
    stream; the counts are densified against a bucket spine so absent
    buckets still get their smoothing mass. The model totals come from a
    window over the DSIR_BUCKETS-row count frame, NOT a separate
    ``.agg()`` subtree — a second subtree would re-evaluate the whole
    token aggregate and pay an extra full corpus pass at scale (caught
    in the plan audit when this op was introduced); the window costs one
    exchange of ≤ DSIR_BUCKETS rows regardless of corpus size."""
    spark = docs.sparkSession
    tb = docs.filter(F.col("text").isNotNull()).select(
        "source", F.explode(tokens()).alias("tok")
    ).select("source", _dsir_bucket(F.col("tok")))
    is_t = F.col("source") == DSIR_TARGET_SOURCE
    spine = spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))
    cnt = spine.join(
        tb.groupBy("b").agg(
            F.sum(F.when(is_t, 1).otherwise(0)).alias("nt"),
            F.sum(F.when(is_t, 0).otherwise(1)).alias("nr"),
        ),
        "b",
        "left",
    ).fillna(0, ["nt", "nr"])
    wall = Window.partitionBy()
    a, nb = DSIR_ALPHA, DSIR_BUCKETS
    return cnt.select(
        "b",
        (
            F.log((F.col("nt") + a) / (F.sum("nt").over(wall) + a * nb))
            - F.log((F.col("nr") + a) / (F.sum("nr").over(wall) + a * nb))
        ).alias("llr"),
    )


def dsir_annotate(
    df: DataFrame, llr: DataFrame, row_key: str | None = None
) -> DataFrame:
    """Annotate EVERY row of ``df`` (any schema with a ``text`` column)
    with ``n_toks`` / ``log_weight`` against a (broadcast) DSIR model
    frame with columns (b, llr) — the shared scoring kernel of the batch
    weights op and the streaming ingestion gate.

    Pass-through contract and row-key rules are identical to
    :func:`contamination_annotate` (one output row per input row,
    synthetic id localCheckpoints first — see that docstring for why).
    NULL-text rows pass through with n_toks = 0 and log_weight = 0.0.

    Scale: the model is ≤ DSIR_BUCKETS rows → broadcast; the corpus side
    never shuffles for the probe. The only shuffles are the groupBy/join
    on the unique row key (high-cardinality, skew-free)."""
    if row_key is None:
        df = df.localCheckpoint(eager=True)
        base = df.withColumn("__uid", F.monotonically_increasing_id())
    else:
        base = df.withColumn("__uid", F.col(row_key))
    return (
        base.join(_dsir_scores(base, llr), "__uid", "left")
        .drop("__uid")
        .withColumn("n_toks", F.coalesce("n_toks", F.lit(0)))
        .withColumn("log_weight", F.coalesce("log_weight", F.lit(0.0)))
    )


def _dsir_scores(keyed: DataFrame, llr: DataFrame) -> DataFrame:
    """The scoring aggregate itself: (__uid, n_toks, log_weight) for every
    non-NULL-text row of a ``__uid``-keyed frame — THE arithmetic both
    :func:`dsir_annotate` (which joins it back for pass-through) and the
    batch weights op (whose output IS this frame, so it skips the
    join-back and one corpus scan) share."""
    return (
        keyed.filter(F.col("text").isNotNull())
        .select("__uid", F.explode(tokens()).alias("tok"))
        .select("__uid", _dsir_bucket(F.col("tok")))
        .join(F.broadcast(llr), "b")
        .groupBy("__uid")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("llr").alias("log_weight"),
        )
    )


def _dsir_weights_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared DSIR scorer: hashed-unigram importance weights of every RAW
    document (source != DSIR_TARGET_SOURCE) against the target domain.

    DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling") fits two bag-of-hashed-n-gram models — target
    p̂_t and raw p̂_r — and weights each raw doc by
    log w = Σ_tokens (ln p̂_t[bucket] − ln p̂_r[bucket]), add-alpha
    smoothed. Re-expressed Spark-first: the fit is
    :func:`dsir_fit_llr` (one map-side-combinable groupBy; ≤ 256-row
    model), scoring is the shared :func:`dsir_annotate` kernel
    (broadcast model, (doc_id)-keyed rollup). Two passes over the corpus
    total (fit, score), which is DSIR's own structure — and exactly the
    frozen-model shape the streaming gate replays per micro-batch.

    Read through the session memo: the weights frame is deterministic in
    sf_dir and doc-sized, and both ``docs_dsir_weights`` and
    ``docs_dsir_resample`` consume it — each previously re-ran the fit
    and the scoring pass."""
    from komodo_data_spark.operators.model_memo import session_model

    def fit():
        d = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        llr = dsir_fit_llr(d)
        raw = d.filter(F.col("source") != DSIR_TARGET_SOURCE)
        return (
            _dsir_scores(raw.withColumn("__uid", F.col("doc_id")), llr)
            .select(F.col("__uid").alias("doc_id"), "n_toks", "log_weight")
            .localCheckpoint(eager=True)
        )

    return session_model(spark, "dsir_weights", (sf_dir,), fit)


def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight (hashed-unigram log-likelihood
    ratio vs the target domain) — see _dsir_weights_frame for the method
    and the scale shape. Positive log_weight = looks more like the target
    than like the raw pool; this is the score DSIR resamples by and the
    continuous sibling of source_unigram_divergence's per-source KL."""
    return _dsir_weights_frame(spark, sf_dir)


def _dsir_weights_oracle_body() -> str:
    a, nb = DSIR_ALPHA, DSIR_BUCKETS
    return f"""
    WITH d AS (
      SELECT doc_id, source, {sql_tokens("text")} AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    tb AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(t.tok), 1, 2) AS UBIGINT) AS b
      FROM d, unnest(d.toks) AS t(tok)
    ),
    cnt AS (
      SELECT s.b, coalesce(c.nt, 0) AS nt, coalesce(c.nr, 0) AS nr
      FROM (SELECT t.b FROM unnest(range(0, {nb})) AS t(b)) s
      LEFT JOIN (
        SELECT b,
               sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END) AS nt,
               sum(CASE WHEN source <> '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END) AS nr
        FROM tb GROUP BY b
      ) c ON c.b = s.b
    ),
    tot AS (SELECT sum(nt) AS tt, sum(nr) AS tr FROM cnt),
    llr AS (
      SELECT b, ln((nt + {a}) / (tt + {a} * {nb}))
               - ln((nr + {a}) / (tr + {a} * {nb})) AS llr
      FROM cnt, tot
    )
    SELECT tb.doc_id, count(*) AS n_toks, sum(l.llr) AS log_weight
    FROM tb JOIN llr l ON l.b = tb.b
    WHERE tb.source <> '{DSIR_TARGET_SOURCE}'
    GROUP BY tb.doc_id
    """


def docs_dsir_weights_oracle() -> str:
    return _dsir_weights_oracle_body()


def docs_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's sampling step: Gumbel-top-K over the importance weights —
    sampling-without-replacement ∝ w via key = log w − ln(−ln(u)), with
    u a DETERMINISTIC md5-derived uniform per doc (same derandomization
    trade as docs_weighted_sample: stable under retries and appends of
    later docs, and engine-portable for the oracle).

    Scale shape: the Gumbel key is a pure projection over the weights
    frame; top-K is orderBy+limit, which Spark plans as
    TakeOrderedAndProject — each task keeps its local top-K and the
    driver merges |tasks|·K rows; no global sort shuffle at any corpus
    size."""
    w = _dsir_weights_frame(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir|"), F.col("doc_id").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(16**6))
    g = (F.col("log_weight") - F.log(-F.log(u))).alias("gumbel_key")
    return (
        w.select("doc_id", "log_weight", g)
        .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(DSIR_SAMPLE_K)
    )


def docs_dsir_resample_oracle() -> str:
    u = (
        "(CAST('0x' || substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 6)"
        f" AS UBIGINT) + 0.5) / {float(16**6)}"
    )
    return f"""
    WITH w AS ({_dsir_weights_oracle_body()})
    SELECT doc_id, log_weight,
           log_weight - ln(-ln({u})) AS gumbel_key
    FROM w
    ORDER BY gumbel_key DESC, doc_id ASC
    LIMIT {DSIR_SAMPLE_K}
    """


# --------------------------------------------------------------------------
# exact stratified sampling (per-stratum quotas without per-stratum sorts)
# --------------------------------------------------------------------------

STRATA_QUOTA = 50  # docs kept per language


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY ``STRATA_QUOTA`` documents per language (all of them when a
    language has fewer) — deterministic across runs and engines: the kept
    set is the quota-smallest md5(doc_id) hashes per stratum, so growing
    the corpus only ever swaps members, never reshuffles them randomly.
    Per-stratum exact quotas are the sampling move mixture recipes need
    when proportional sampling would starve low-resource strata.

    Scale design: this is the scale twin ``docs_per_source_sample_k``'s
    docstring promises — the per-stratum cutoff is
    ``quantiles.exact_group_kth`` (the k-th smallest hash located by the
    bucket-prefix pass), so there is NO per-stratum sort or rank window
    over the corpus (the window form sorts every stratum; fine for a few
    bounded sources, wrong for high-cardinality strata); the |langs|-row
    cutoff table broadcasts back and the keep decision is a map-side
    hash-compare. 13 hex chars (52 bits) keep the hash exactly
    representable in the fit's double domain.

    Cutoff ties (a second row sharing the 52-bit cutoff hash within a
    stratum — astronomically unlikely, but the contract says EXACTLY
    quota) break deterministically on doc_id: rows strictly below the
    cutoff always keep, and rows AT the cutoff rank by doc_id for the
    remaining slots — the engine-side mirror of the oracle's
    ``ORDER BY h, doc_id`` row_number. The tie branch is a map-side
    filter feeding a window over the ~|strata|-row tie frame, so the
    exactness guarantee costs one extra tiny aggregate, not a sort.
    """
    from komodo_data_spark.operators.quantiles import exact_group_kth

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast("long").alias("h")
    )
    cut = exact_group_kth(d, ["lang"], "h", STRATA_QUOTA, out_col="cut")
    j = d.join(F.broadcast(cut), "lang")
    below = j.filter(F.col("h") < F.col("cut")).select("doc_id", "lang")
    n_below = (
        j.filter(F.col("h") < F.col("cut"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    wt = Window.partitionBy("lang").orderBy("doc_id")
    tie_kept = (
        j.filter(F.col("h") == F.col("cut"))
        .join(F.broadcast(n_below), "lang", "left")
        .withColumn("rn", F.row_number().over(wt))
        .filter(
            F.col("rn")
            <= F.lit(STRATA_QUOTA) - F.coalesce("n_below", F.lit(0))
        )
        .select("doc_id", "lang")
    )
    return below.unionByName(tie_kept).orderBy("lang", "doc_id")


def docs_stratified_sample_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
                  AS BIGINT) AS h
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM h
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= {STRATA_QUOTA}
    ORDER BY lang, doc_id
    """
