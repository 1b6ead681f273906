"""Degenerate-input sweep: EVERY registry query must run on an empty
dataset (all tables present, zero rows) and return a DataFrame rather than
raise — the fresh-partition / day-one state every production pipeline hits.

Found in round 3: approx_top_k_combine over zero sketch rows crashes with
scala.MatchError rather than yielding an empty sketch (fixed by seeding the
combine with an accumulate-over-nothing, which IS a valid empty sketch).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from komodo_data_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        s = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], f.type) for f in s}, schema=s),
            os.path.join(str(d), f"{t}.parquet"),
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as e

    fails = []
    for name, fn in e.queries().items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as exc:  # noqa: BLE001 - collecting the full list
            fails.append(f"{name}: {exc!r}"[:300])
    assert not fails, "queries crashed on empty input:\n" + "\n".join(fails)


@pytest.fixture(scope="module")
def nulled_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with NULLs injected into optional columns of every 7th row —
    the shape real crawl/telemetry data has."""
    d = tmp_path_factory.mktemp("sf_nulls")
    nullable = {
        "documents": ["text", "lang", "source"],
        "events": ["props", "event_type", "value"],
        "embeddings": ["embedding", "label"],
        "customer": ["c_comment"],
        "orders": ["o_comment", "o_orderpriority"],
        "lineitem": ["l_comment"],
    }
    import pyarrow.compute as pc

    for t in TABLE_NAMES:
        tb = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        n = tb.num_rows
        if t in nullable and n:
            mask = pa.array([i % 7 == 0 for i in range(n)], pa.bool_())
            for col in nullable[t]:
                if col not in tb.column_names:
                    continue
                i = tb.column_names.index(col)
                arr = tb.column(i).combine_chunks()
                tb = tb.set_column(
                    i, tb.field(i), pc.if_else(mask, pa.nulls(n, arr.type), arr)
                )
        pq.write_table(tb, os.path.join(str(d), f"{t}.parquet"))
    return str(d)


def test_every_query_survives_null_heavy_tables(spark, nulled_sf_dir):
    """Found in round 3: null embeddings killed the BLAS cogroup stages
    (np.stack over None) and null texts killed every media op (len(None)
    in the Arrow batch); both now drop null rows at the source with
    oracle-equivalent semantics."""
    import __spark_entry__ as e

    fails = []
    for name, fn in e.queries().items():
        try:
            fn(spark, nulled_sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            fails.append(f"{name}: {exc!r}"[:300])
    assert not fails, "queries crashed on null-heavy input:\n" + "\n".join(fails)


@pytest.fixture(scope="module")
def shuffled_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with documents/events rewritten as MANY files in a scrambled
    row order — the physical layout a real ingest produces. Operators that
    claim determinism must not notice."""
    import numpy as np

    d = tmp_path_factory.mktemp("sf_shuffled")
    rng = np.random.RandomState(7)
    for t in TABLE_NAMES:
        tb = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        if t in ("documents", "events", "embeddings") and tb.num_rows > 8:
            idx = rng.permutation(tb.num_rows)
            shuffled = tb.take(pa.array(idx, pa.int64()))
            os.makedirs(os.path.join(str(d), f"{t}.parquet"))
            step = -(-tb.num_rows // 8)
            for i in range(8):
                part = shuffled.slice(i * step, step)
                if part.num_rows:
                    pq.write_table(
                        part,
                        os.path.join(str(d), f"{t}.parquet", f"part-{i}.parquet"),
                    )
        else:
            pq.write_table(tb, os.path.join(str(d), f"{t}.parquet"))
    return str(d)


#: Queries whose determinism-under-layout claim is load-bearing (keep-first
#: choices, ordinals, hash orders, label propagation, top-k ties).
LAYOUT_SENSITIVE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_oph",
    "dedup_clusters",
    "dedup_clusters_star",
    "customers_fuzzy_name_pairs",
    "dedup_substring_spans",
    "docs_token_budget_mix",
    "docs_token_budget_mix_twostage",
    "docs_surrogate_keys",
    "token_packing",
    "knn_brute_force",
    "dedup_keep_latest",
    "events_transition_matrix",
]


def test_layout_sensitive_queries_are_layout_invariant(spark, shuffled_sf_dir):
    """Identical results from a many-file scrambled layout and the pristine
    single-file layout: physical row order must never leak into output."""
    import __spark_entry__ as e

    qs = e.queries()
    diffs = []
    for name in LAYOUT_SENSITIVE:
        a = qs[name](spark, "/root/testdata/sf0.001").toPandas()
        b = qs[name](spark, shuffled_sf_dir).toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        try:
            import pandas as pd

            pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9)
        except AssertionError as exc:
            diffs.append(f"{name}: {str(exc).splitlines()[0]}")
    assert not diffs, "layout leaked into results:\n" + "\n".join(diffs)
