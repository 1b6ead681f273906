"""Hand-computed pins for the round-8 depth ops: MAD modified z-scores,
Spearman rank trend (incl. the tie midrank), hourly autocorrelation on a
gappy grid, and the l-diversity audit. Each builds a tiny table whose
answer is derivable by hand, pinning semantics independently of the
DuckDB oracle pairing in scripts/check.py."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq

NS = 1_000_000  # ms -> ns


def _write_events(tmp_path, rows, name="r8_sf"):
    """rows: (event_id, event_type, value, ts_ms)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[3] * NS for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


def test_mad_outliers_hand_computed(spark, tmp_path):
    """type m: values {1,2,3,4,100} -> median 3, absdevs {2,1,0,1,97},
    MAD 1; only 100 crosses 0.6745*|dev| > 3.5 (mod_z = 65.4265). A
    constant type has MAD 0 and must emit NOTHING (documented)."""
    from komodo_data_spark.operators.stats_ops import events_mad_outliers

    rows = [
        (1, "m", 1.0, 1000),
        (2, "m", 2.0, 2000),
        (3, "m", 3.0, 3000),
        (4, "m", 4.0, 4000),
        (5, "m", 100.0, 5000),
        (6, "c", 5.0, 6000),
        (7, "c", 5.0, 7000),
        (8, "c", 5.0, 8000),
    ]
    d = _write_events(tmp_path, rows)
    out = events_mad_outliers(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["event_id"], r["event_type"], r["value"]) == (5, "m", 100.0)
    assert abs(r["mod_z"] - 0.6745 * 97.0) < 1e-12


def test_spearman_trend_hand_computed(spark, tmp_path):
    """Monotone-up values -> rho exactly 1; monotone-down -> -1; the tie
    case {1,1,2} over increasing time gets midranks (1.5, 1.5, 3) ->
    rho = sqrt(3)/2. A constant-value type is excluded (rho undefined)."""
    from komodo_data_spark.operators.stats_ops import events_spearman_trend

    rows = (
        [(i, "up", float(i), i * 1000) for i in range(1, 6)]
        + [(10 + i, "down", float(10 - i), i * 1000) for i in range(1, 6)]
        + [
            (21, "tie", 1.0, 1000),
            (22, "tie", 1.0, 2000),
            (23, "tie", 2.0, 3000),
        ]
        + [(31, "flat", 7.0, 1000), (32, "flat", 7.0, 2000)]
    )
    d = _write_events(tmp_path, rows)
    got = {r["event_type"]: r for r in events_spearman_trend(spark, d).collect()}
    assert set(got) == {"up", "down", "tie"}  # flat excluded
    assert abs(got["up"]["spearman_rho"] - 1.0) < 1e-12
    assert abs(got["down"]["spearman_rho"] + 1.0) < 1e-12
    assert abs(got["tie"]["spearman_rho"] - math.sqrt(3) / 2) < 1e-12
    assert got["up"]["n"] == 5 and got["tie"]["n"] == 3


def test_hourly_acf_hand_computed(spark, tmp_path):
    """type ramp: one event per hour, values 1..6 -> ACF 1.0 at lags 1
    and 2; no hour pair is 24 apart, so no lag-24 row. type alt:
    alternating 1/5 -> ACF -1 at lag 1, +1 at lag 2. A GAP (missing
    hour) must shrink n_pairs, not smear the lag alignment."""
    from komodo_data_spark.operators.stats_ops import (  # noqa: F401
        events_mad_outliers,
    )
    from komodo_data_spark.operators.timeseries import (
        HOUR_MS,
        events_hourly_acf,
    )

    rows = [
        (i, "ramp", float(i), i * HOUR_MS) for i in range(1, 7)
    ] + [
        (10 + i, "alt", 1.0 if i % 2 == 0 else 5.0, i * HOUR_MS)
        for i in range(6)
    ]
    # gap type: hours 0,1,3,4 with values 1,2,4,5 -> lag-1 pairs are
    # (1,2),(4,5) only (hour 2 missing): corr of {(1,2),(4,5)} = 1
    rows += [
        (21, "gap", 1.0, 0),
        (22, "gap", 2.0, 1 * HOUR_MS),
        (23, "gap", 4.0, 3 * HOUR_MS),
        (24, "gap", 5.0, 4 * HOUR_MS),
    ]
    d = _write_events(tmp_path, rows)
    got = {
        (r["event_type"], r["lag"]): r
        for r in events_hourly_acf(spark, d).collect()
    }
    assert abs(got[("ramp", 1)]["acf"] - 1.0) < 1e-12
    assert abs(got[("ramp", 2)]["acf"] - 1.0) < 1e-12
    assert ("ramp", 24) not in got
    assert abs(got[("alt", 1)]["acf"] + 1.0) < 1e-12
    assert abs(got[("alt", 2)]["acf"] - 1.0) < 1e-12
    assert got[("gap", 1)]["n_pairs"] == 2
    assert abs(got[("gap", 1)]["acf"] - 1.0) < 1e-12


def test_l_diversity_hand_computed(spark, tmp_path):
    """Class (nation 1, band 1) = segments {A,A,A,B}: 2 distinct < 3 ->
    below_l, entropy ln4 - (3 ln3)/4. Class (nation 2, band 0) =
    {A,B,C}: 3 distinct -> diverse, entropy ln 3."""
    from komodo_data_spark.operators.pipeline_ops import customers_l_diversity

    segs = [
        (1, 1, 1500.0, "A"),
        (2, 1, 1600.0, "A"),
        (3, 1, 1700.0, "A"),
        (4, 1, 1800.0, "B"),
        (5, 2, 10.0, "A"),
        (6, 2, 20.0, "B"),
        (7, 2, 30.0, "C"),
    ]
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in segs], pa.int64()),
            "c_name": pa.array([f"C#{r[0]}" for r in segs], pa.string()),
            "c_nationkey": pa.array([r[1] for r in segs], pa.int32()),
            "c_acctbal": pa.array([r[2] for r in segs], pa.float64()),
            "c_mktsegment": pa.array([r[3] for r in segs], pa.string()),
        }
    )
    d = tmp_path / "ldiv_sf"
    d.mkdir()
    pq.write_table(table, d / "customer.parquet")
    got = {
        (r["c_nationkey"], r["bal_band"]): r
        for r in customers_l_diversity(spark, str(d)).collect()
    }
    a, b = got[(1, 1)], got[(2, 0)]
    assert a["class_size"] == 4 and a["n_distinct_sensitive"] == 2
    assert a["below_l"] is True
    assert abs(
        a["sensitive_entropy"] - (math.log(4) - 3 * math.log(3) / 4)
    ) < 1e-12
    assert b["class_size"] == 3 and b["n_distinct_sensitive"] == 3
    assert b["below_l"] is False
    assert abs(b["sensitive_entropy"] - math.log(3)) < 1e-12


def test_bloom_fit_has_no_false_negatives(spark):
    """The decontamination bloom's only correctness obligation: EVERY
    inserted key must pass the filter (false positives are fine — the
    exact semi-join removes them; a false negative would silently drop a
    contaminated document). Checked on adversarial keys (empty string,
    unicode, near-duplicates) plus a measured FP rate sanity band."""
    from pyspark.sql import functions as F

    from komodo_data_spark.operators.pipeline_ops import (
        DECONTAM_BLOOM_K,
        _BLOOM_BUCKET_SEED,
        _bloom_geometry,
        bloom_fit,
    )

    keys = ["", "a", "aa", "ab", "ba", "the quick fox", "the quick fox ",
            "éèê", "0", "00"] + [f"k{i}" for i in range(500)]
    kdf = spark.createDataFrame([(k,) for k in keys], ["s"])
    n_buckets, bits_per = _bloom_geometry(len(keys))
    assert n_buckets >= 8  # the structural-bucketing floor
    bf = bloom_fit(kdf, "s", len(keys)).localCheckpoint(eager=True)
    assert bf.count() <= n_buckets

    def probe(df):
        ex = df.withColumn(
            "bkt",
            F.pmod(
                F.xxhash64(F.col("s"), F.lit(_BLOOM_BUCKET_SEED)),
                F.lit(n_buckets),
            ),
        ).join(F.broadcast(bf), "bkt", "left")
        for k in range(DECONTAM_BLOOM_K):
            ex = ex.withColumn(
                f"_p{k}",
                F.pmod(F.xxhash64(F.col("s"), F.lit(k)), F.lit(bits_per)),
            )
        might = F.col("bf").isNotNull()
        for k in range(DECONTAM_BLOOM_K):
            might = might & (
                F.coalesce(
                    F.expr(
                        f"element_at(bf, CAST(_p{k} div 64 AS INT) + 1) "
                        f"& shiftleft(CAST(1 AS BIGINT), CAST(_p{k} % 64 AS INT))"
                    ),
                    F.lit(0).cast("long"),
                )
                != 0
            )
        return ex.withColumn("hit", might)

    # no false negatives: all inserted keys pass
    assert probe(kdf).filter(~F.col("hit")).count() == 0
    # false positives bounded: ~0.24% predicted at m/n=16,k=4; allow 10x
    misses = spark.createDataFrame(
        [(f"miss{i}",) for i in range(20_000)], ["s"]
    )
    fp = probe(misses).filter(F.col("hit")).count()
    assert fp <= 20_000 * 0.024, fp


def test_prefix_filtered_jaccard_is_complete(spark):
    """Property test: the PPJoin prefix filter must find EXACTLY the
    pairs the naive all-pairs Jaccard finds — completeness is the whole
    claim (the integer prefix-length arithmetic exists because a float
    ceil can silently shorten a prefix). Random tiny corpora over a
    3-token alphabet force heavy gram sharing and boundary Jaccards."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from komodo_data_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    @given(
        st.lists(
            st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1,
                     max_size=6, unique=True),
            min_size=2,
            max_size=10,
        ),
        st.sampled_from([(1, 2), (7, 10), (4, 5), (1, 3)]),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def inner(sets, q):
        num, den = q
        posts = spark.createDataFrame(
            [(i, g) for i, gs in enumerate(sets) for g in gs],
            ["doc_id", "g"],
        )
        got = {
            (r["doc_i"], r["doc_j"]): r["jaccard"]
            for r in prefix_filtered_jaccard_pairs(posts, num, den).collect()
        }
        want = {}
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                a, b = set(sets[i]), set(sets[j])
                jac = len(a & b) / len(a | b)
                if jac >= num / den:
                    want[(i, j)] = jac
        assert set(got) == set(want), (sets, q, got, want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-15

    inner()
