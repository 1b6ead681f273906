"""Engine-exact per-group quantiles at ARBITRARY fractions.

Why this module exists: Spark's exact ``percentile`` and DuckDB's
``quantile_cont`` both linearly interpolate at rank position ``(n-1)*q``,
but each computes that position in ITS OWN floating-point expression.
For a dyadic ``q`` (0.25/0.5/0.75) the product is exact and both engines
pick the same bracket; for any other fraction (0.7, 0.9, 1/3 — the values
real curation recipes use: CCNet head/tail cuts, RFM quintiles) the
position can land within an ulp of an integer on one engine and not the
other, flipping which pair of order statistics the threshold interpolates
between. Round 6 measured exactly that: q=0.7 flipped 2 rows at sf0.001.

The fix implemented here removes floating point from bracket selection
entirely. For ``q = num/den`` (a small rational):

    pos_num = (n - 1) * num            -- exact bigint
    k_lo    = pos_num div den          -- exact integer division
    rem     = pos_num mod den          -- exact remainder
    k_hi    = k_lo + (rem > 0)         -- ceil
    frac    = rem / den                -- ONE double division of small ints
    thr     = v[k_lo] + frac * (v[k_hi] - v[k_lo])

``v[k]`` is the k-th (0-indexed, ascending) order statistic of the group.
Both engines run the same integer arithmetic, the same small-int double
division, and the same three-op interpolation on the same double inputs —
the result is bit-identical by IEEE-754 determinism, for ANY fraction.

Order-statistic selection is the two-stage bucket-prefix shape used by
``docs_surrogate_keys`` (pipeline_ops.py) rather than a per-group window
over the corpus: rows are value-bucketed map-side, a tiny
(|groups| x n_buckets) histogram is prefix-summed to locate the one
bucket holding rank k, and only that bucket's rows (~ n/n_buckets of the
group) are sorted. No corpus-wide or group-wide sort exists in the plan,
so the same plan fits a 100 TB group by raising ``n_buckets`` (or
recursing a second level, which this corpus never needs).

The reference (process.py) has no quantile operator at all — this is
north-star extension surface (SURVEY.md §2.12 curation ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Value-range buckets for the order-statistic locate stage. Each final
#: per-bucket sort touches ~ group_size / N_QUANTILE_BUCKETS rows.
N_QUANTILE_BUCKETS = 64


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, tuple[int, int]],
    n_buckets: int = N_QUANTILE_BUCKETS,
) -> DataFrame:
    """Return one row per group with a column per requested quantile.

    ``quantiles`` maps output column name -> ``(num, den)`` with
    ``0 <= num <= den``; the fraction is ``num/den``. ``group_cols`` may
    be empty for a single global quantile row. NULL values are ignored
    (matching ``quantile_cont``). The result frame has |groups| rows and
    is meant to be broadcast back onto the scoring pass.

    Engine-exactness contract: given that ``value_col`` holds doubles
    that are bit-identical to the oracle engine's (same formula on both
    sides — the standard requirement everywhere in this repo), every
    returned threshold is bit-identical to the SQL produced by
    :func:`oracle_group_quantile_sql`.
    """
    for name, spec in quantiles.items():
        if spec[0] == "kth":
            if int(spec[1]) < 1:
                raise ValueError(f"{name}: kth rank must be >= 1, got {spec[1]}")
            continue
        num, den = spec
        if not (0 <= num <= den) or den <= 0:
            raise ValueError(f"quantile {name}: need 0 <= num <= den, got {num}/{den}")

    v = F.col(value_col).cast("double")
    df = df.select(*group_cols, v.alias(value_col)).filter(v.isNotNull())
    # Empty group_cols -> one global group; a constant key keeps every
    # stage below identical instead of special-casing the scalar path.
    if not group_cols:
        df = df.withColumn("_g", F.lit(1))
        group_cols = ["_g"]

    # Stage 0 — per-group extrema + count (one hash aggregate, map-side
    # combinable), then the EXACT integer bracket arithmetic per fraction.
    kframe = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_vmin"),
        F.max(value_col).alias("_vmax"),
        F.count(value_col).alias("_n"),
    )
    for name, spec in quantiles.items():
        if spec[0] == "kth":
            # fixed 1-based rank, clamped to the group size: klo = min(k, n)-1
            kframe = kframe.withColumn(
                f"_klo_{name}",
                F.least(F.lit(int(spec[1])).cast("long"), F.col("_n")) - 1,
            ).withColumn(f"_krem_{name}", F.lit(0).cast("long"))
        else:
            num, den = spec
            kframe = kframe.withColumn(
                f"_klo_{name}", F.expr(f"((_n - 1) * {num}) div {den}")
            ).withColumn(f"_krem_{name}", F.expr(f"((_n - 1) * {num}) % {den}"))

    # Stage 1 — map-side value bucketing. The bucket id is a pure function
    # of (value, group extrema): equal values always share a bucket, so a
    # rank located in bucket b is served entirely by b's rows.
    span = F.col("_vmax") - F.col("_vmin")
    bucket = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("_vmin")) / span * n_buckets).cast(
                "int"
            ),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = df.join(F.broadcast(kframe), group_cols).withColumn("_b", bucket)

    # Stage 2 — (|groups| x n_buckets)-row histogram; prefix-sum per group
    # (a window over the TINY histogram frame, never over the corpus) gives
    # each bucket its global rank interval [_cum, _cum + _cnt).
    hist = bucketed.groupBy(*group_cols, "_b").agg(F.count(F.lit(1)).alias("_cnt"))
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn("_cum", F.coalesce(F.sum("_cnt").over(wc), F.lit(0)))

    # Stage 3 — locate the bucket + local offset of every requested rank
    # (lo and hi bracket ends per fraction). <= 2·|quantiles| rows/group.
    targets = []
    for name in quantiles:
        klo = F.col(f"_klo_{name}")
        khi = klo + (F.col(f"_krem_{name}") > 0).cast("bigint")
        targets.append(
            F.struct(F.lit(f"{name}.lo").alias("which"), klo.alias("k"))
        )
        targets.append(
            F.struct(F.lit(f"{name}.hi").alias("which"), khi.alias("k"))
        )
    tk = (
        hist.join(kframe, group_cols)
        .select(*group_cols, "_b", "_cum", "_cnt", F.explode(F.array(*targets)).alias("_t"))
        .filter(
            (F.col("_t.k") >= F.col("_cum"))
            & (F.col("_t.k") < F.col("_cum") + F.col("_cnt"))
        )
        .select(
            *group_cols,
            "_b",
            F.col("_t.which").alias("_which"),
            (F.col("_t.k") - F.col("_cum")).alias("_lk"),
        )
    )

    # Stage 4 — sort ONLY the target buckets (each ~ group/n_buckets rows;
    # the broadcast semi-join drops every other bucket at the scan) and
    # pick the local rank. Ties: equal values share a bucket and any tie
    # order yields the same VALUE at a given rank, so row_number is safe.
    w = Window.partitionBy(*group_cols, "_b", "_which").orderBy(value_col)
    picked = (
        bucketed.join(F.broadcast(tk), [*group_cols, "_b"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") - 1 == F.col("_lk"))
        .groupBy(*group_cols)
        .agg(
            *[
                agg
                for name in quantiles
                for agg in (
                    F.min(
                        F.when(F.col("_which") == f"{name}.lo", F.col(value_col))
                    ).alias(f"_vlo_{name}"),
                    F.min(
                        F.when(F.col("_which") == f"{name}.hi", F.col(value_col))
                    ).alias(f"_vhi_{name}"),
                )
            ]
        )
    )

    # Stage 5 — the one floating-point step, identical on both engines:
    # frac = rem/den (small-int double division), then lo + frac*(hi-lo).
    out = picked.join(kframe, group_cols)
    cols = []
    for name, spec in quantiles.items():
        den = 1 if spec[0] == "kth" else spec[1]
        frac = F.col(f"_krem_{name}").cast("double") / F.lit(den).cast("double")
        cols.append(
            (
                F.col(f"_vlo_{name}")
                + frac * (F.col(f"_vhi_{name}") - F.col(f"_vlo_{name}"))
            ).alias(name)
        )
    keep = [c for c in group_cols if c != "_g"]
    return out.select(*keep, *cols)


def oracle_group_quantile_sql(
    source: str,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, tuple[int, int]],
    prefix: str = "_eq",
) -> str:
    """DuckDB CTE block computing the SAME thresholds as
    :func:`exact_group_quantiles` — deliberately via a DIFFERENT algorithm
    (plain per-group ``row_number`` rank selection) so the oracle is an
    independent check of the bucket-prefix plan, not its transliteration.
    Emits CTE bodies ``{prefix}_ranked/_kk/_vv/_thr``; join the final
    ``{prefix}_thr`` (columns: group cols + one column per quantile name).
    Must be embedded in an existing WITH chain (prefix with a comma);
    ``prefix`` disambiguates multiple blocks in one statement.
    """
    g = ", ".join(group_cols) if group_cols else "1 AS _g"
    gkey = ", ".join(group_cols) if group_cols else "_g"
    part = f"PARTITION BY {gkey} " if group_cols else ""
    kk_cols, vv_cols, thr_cols = [], [], []
    for name, (num, den) in quantiles.items():
        kk_cols.append(
            f"((_n - 1) * {num}) // {den} AS _klo_{name}, "
            f"((_n - 1) * {num}) % {den} AS _krem_{name}"
        )
        vv_cols.append(
            f"min(CASE WHEN _r = _klo_{name} THEN _v END) AS _vlo_{name}, "
            f"min(CASE WHEN _r = _klo_{name} + "
            f"(CASE WHEN _krem_{name} > 0 THEN 1 ELSE 0 END) "
            f"THEN _v END) AS _vhi_{name}"
        )
        thr_cols.append(
            f"_vlo_{name} + (_krem_{name}::DOUBLE / {den}) "
            f"* (_vhi_{name} - _vlo_{name}) AS {name}"
        )
    grp_out = (", ".join(group_cols) + ",") if group_cols else ""
    p = prefix
    return f"""
    {p}_base AS (
      SELECT {g}, {value_col}::DOUBLE AS _v FROM {source}
      WHERE {value_col} IS NOT NULL
    ),
    {p}_ranked AS (
      SELECT {gkey}, _v,
             row_number() OVER ({part}ORDER BY _v) - 1 AS _r
      FROM {p}_base
    ),
    {p}_kk AS (
      SELECT {gkey}, {", ".join(kk_cols)}
      FROM (SELECT {gkey}, count(*) AS _n FROM {p}_base GROUP BY {gkey})
    ),
    {p}_vv AS (
      SELECT r.{gkey.replace(", ", ", r.")}, {", ".join(vv_cols)}
      FROM {p}_ranked r JOIN {p}_kk USING ({gkey})
      GROUP BY r.{gkey.replace(", ", ", r.")}
    ),
    {p}_thr AS (
      SELECT {grp_out} {", ".join(thr_cols)}
      FROM {p}_vv JOIN {p}_kk USING ({gkey})
    )"""


def exact_group_weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    quantiles: dict[str, tuple[int, int]],
    n_buckets: int = N_QUANTILE_BUCKETS,
) -> DataFrame:
    """WEIGHTED-rank sibling of :func:`exact_group_quantiles`: the returned
    threshold for fraction ``q = num/den`` is the smallest value ``v`` such
    that the cumulative WEIGHT of rows with value <= v reaches
    ``target = clamp(ceil(W·num/den), 1, W)`` (W = the group's total
    weight). This is the cut real curation recipes need — "drop the
    lowest-quality 30% of TOKENS" weights each document by its token
    count, not 1 (round-7 verdict #2: the unweighted form selects kth-order
    statistics of rows, so a source full of short junk docs loses far less
    than 30% of its token mass).

    Exactness: weights must be positive INTEGERS (token counts are), so
    ``target`` is pure bigint arithmetic — ``(W·num) div den`` plus a
    remainder test — and the threshold is an ACTUAL data value (no
    interpolation: there is no meaningful between-value token position, and
    skipping it keeps the whole fit in integer + comparison arithmetic,
    bit-identical across engines with no IEEE subtlety at all). Rows with
    NULL value or NULL/non-positive weight are ignored. ``q = 0/den``
    returns the group min (target clamps to 1); ``q = den/den`` the max.

    Scale shape is stage-for-stage the unweighted fit: one extrema+total
    aggregate, map-side value bucketing, a (|groups| x n_buckets) histogram
    of WEIGHT sums prefix-summed per group (tiny window), then a running
    weight cumsum inside only the located buckets (~group/n_buckets rows
    each). No corpus- or group-wide sort exists in the plan. The picked
    row is tie-safe: equal values share a bucket and the first crossing of
    the running cumsum lands on the same VALUE under any tie order.
    """
    for name, (num, den) in quantiles.items():
        if not (0 <= num <= den) or den <= 0:
            raise ValueError(
                f"quantile {name}: need 0 <= num <= den, got {num}/{den}"
            )

    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("long")
    df = (
        df.select(*group_cols, v.alias(value_col), w.alias("_w"))
        .filter(v.isNotNull() & w.isNotNull() & (w > 0))
    )
    if not group_cols:
        df = df.withColumn("_g", F.lit(1))
        group_cols = ["_g"]

    # Stage 0 — per-group extrema + total weight, then the exact integer
    # target per fraction: clamp(ceil(W*num/den), 1, W).
    kframe = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_vmin"),
        F.max(value_col).alias("_vmax"),
        F.sum("_w").alias("_wtot"),
    )
    for name, (num, den) in quantiles.items():
        kframe = kframe.withColumn(
            f"_tgt_{name}",
            F.greatest(
                F.least(
                    F.expr(
                        f"((_wtot * {num}) div {den}) + "
                        f"(CASE WHEN (_wtot * {num}) % {den} > 0 THEN 1 ELSE 0 END)"
                    ),
                    F.col("_wtot"),
                ),
                F.lit(1).cast("long"),
            ),
        )

    # Stage 1 — map-side value bucketing (same bucket function as the
    # unweighted fit: equal values always share a bucket).
    span = F.col("_vmax") - F.col("_vmin")
    bucket = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("_vmin")) / span * n_buckets).cast(
                "int"
            ),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = df.join(F.broadcast(kframe), group_cols).withColumn("_b", bucket)

    # Stage 2 — histogram of WEIGHT sums; prefix-sum per group over the
    # tiny (|groups| x n_buckets) frame gives each bucket its cumulative
    # weight interval (_cum, _cum + _cnt].
    hist = bucketed.groupBy(*group_cols, "_b").agg(F.sum("_w").alias("_cnt"))
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn("_cum", F.coalesce(F.sum("_cnt").over(wc), F.lit(0)))

    # Stage 3 — locate the bucket whose weight interval contains each
    # target; the crossing happens at local cumulative weight
    # _lt = target - _cum (1-based in weight units).
    targets = [
        F.struct(F.lit(name).alias("which"), F.col(f"_tgt_{name}").alias("t"))
        for name in quantiles
    ]
    tk = (
        hist.join(kframe, group_cols)
        .select(
            *group_cols,
            "_b",
            "_cum",
            "_cnt",
            F.explode(F.array(*targets)).alias("_t"),
        )
        .filter(
            (F.col("_t.t") > F.col("_cum"))
            & (F.col("_t.t") <= F.col("_cum") + F.col("_cnt"))
        )
        .select(
            *group_cols,
            "_b",
            F.col("_t.which").alias("_which"),
            (F.col("_t.t") - F.col("_cum")).alias("_lt"),
        )
    )

    # Stage 4 — running weight cumsum inside ONLY the target buckets; the
    # first row whose cumulative weight reaches _lt carries the threshold
    # value (exactly one row satisfies _cw - w < _lt <= _cw since weights
    # are positive).
    wrun = (
        Window.partitionBy(*group_cols, "_b", "_which")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        bucketed.join(F.broadcast(tk), [*group_cols, "_b"])
        .withColumn("_cw", F.sum("_w").over(wrun))
        .filter(
            (F.col("_cw") >= F.col("_lt"))
            & (F.col("_cw") - F.col("_w") < F.col("_lt"))
        )
        .groupBy(*group_cols)
        .agg(
            *[
                F.min(
                    F.when(F.col("_which") == name, F.col(value_col))
                ).alias(name)
                for name in quantiles
            ]
        )
    )
    keep = [c for c in group_cols if c != "_g"]
    return picked.select(*keep, *quantiles.keys())


def oracle_group_weighted_quantile_sql(
    source: str,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    quantiles: dict[str, tuple[int, int]],
    prefix: str = "_wq",
) -> str:
    """DuckDB CTE block computing the SAME thresholds as
    :func:`exact_group_weighted_quantiles` via a DIFFERENT algorithm — a
    RANGE-frame cumulative weight (all value ties included at once) and
    ``min(v) WHERE cumw >= target`` instead of bucket location + first
    crossing — so the oracle independently checks the plan. Emits CTEs
    ``{prefix}_base/_tgt/_cum/_thr``; join ``{prefix}_thr`` (group cols +
    one column per quantile name). Embed in an existing WITH chain.
    """
    g = ", ".join(group_cols) if group_cols else "1 AS _g"
    gkey = ", ".join(group_cols) if group_cols else "_g"
    part = f"PARTITION BY {gkey} " if group_cols else ""
    tgt_cols, thr_cols = [], []
    for name, (num, den) in quantiles.items():
        tgt_cols.append(
            f"greatest(least(((_W * {num}) // {den}) + "
            f"(CASE WHEN (_W * {num}) % {den} > 0 THEN 1 ELSE 0 END), _W), 1) "
            f"AS _tgt_{name}"
        )
        thr_cols.append(
            f"min(CASE WHEN _cw >= _tgt_{name} THEN _v END) AS {name}"
        )
    grp_out = (", ".join(group_cols) + ",") if group_cols else ""
    p = prefix
    return f"""
    {p}_base AS (
      SELECT {g}, {value_col}::DOUBLE AS _v, {weight_col}::BIGINT AS _w
      FROM {source}
      WHERE {value_col} IS NOT NULL AND {weight_col} IS NOT NULL
        AND {weight_col} > 0
    ),
    {p}_tgt AS (
      SELECT {gkey}, {", ".join(tgt_cols)}
      FROM (SELECT {gkey}, sum(_w) AS _W FROM {p}_base GROUP BY {gkey})
    ),
    {p}_cum AS (
      SELECT {gkey}, _v,
             sum(_w) OVER ({part}ORDER BY _v
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS _cw
      FROM {p}_base
    ),
    {p}_thr AS (
      SELECT {grp_out} {", ".join(thr_cols)}
      FROM {p}_cum JOIN {p}_tgt USING ({gkey})
      GROUP BY {gkey}
    )"""


def exact_group_kth(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    out_col: str = "kth",
    n_buckets: int = N_QUANTILE_BUCKETS,
) -> DataFrame:
    """Value of the k-th SMALLEST element per group (1-based, clamped to
    the group size) — the fixed-rank sibling of
    :func:`exact_group_quantiles`, same bucket-prefix machinery with the
    rank given absolutely instead of as a fraction of the group. This is
    the primitive behind exact per-group QUOTAS: filter
    ``value <= kth`` to keep exactly k rows per group (when values are
    distinct) without ever sorting a group — the selection plan touches
    ~group/n_buckets rows per group.
    """
    return exact_group_quantiles(
        df, group_cols, value_col, {out_col: ("kth", k)}, n_buckets
    )
