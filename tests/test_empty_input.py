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
