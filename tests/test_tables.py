"""sources.tables normalization contracts: the driver's events.parquet has
shipped `ts` under two different physical types across rounds (raw nanos
int64 in rounds 1-2, timestamp[us] in round 3). normalize_events must
produce the identical canonical trio for BOTH encodings, forever."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from komodo_data_spark.sources.tables import normalize_events

NANOS = [1_706_629_577_239_000_000, 1_706_545_884_014_000_000, 1_700_000_000_123_456_000]


def _base_cols(n):
    return {
        "event_id": list(range(n)),
        "user_id": [7] * n,
        "event_type": ["view"] * n,
        "value": [1.5] * n,
        "props": ["{}"] * n,
    }


def test_normalize_events_identical_across_physical_ts_types(spark, tmp_path):
    n = len(NANOS)
    # encoding A: raw nanos int64 (what nanosAsLong surfaces for TIMESTAMP(NANOS))
    pa_long = pa.table({**_base_cols(n), "ts": pa.array(NANOS, pa.int64())})
    pq.write_table(pa_long, str(tmp_path / "long.parquet"))
    # encoding B: timestamp[us] (round-3 driver testdata)
    pa_us = pa.table(
        {**_base_cols(n), "ts": pa.array([t // 1000 for t in NANOS], pa.timestamp("us"))}
    )
    pq.write_table(pa_us, str(tmp_path / "us.parquet"))

    a = normalize_events(spark.read.parquet(str(tmp_path / "long.parquet")))
    b = normalize_events(spark.read.parquet(str(tmp_path / "us.parquet")))
    cols = ["event_id", "ts", "ts_ms", "ts_ts"]
    pda = a.select(cols).orderBy("event_id").toPandas()
    pdb = b.select(cols).orderBy("event_id").toPandas()
    pd.testing.assert_frame_equal(pda, pdb)
    # spot-check the canonical values themselves
    assert list(pda["ts"]) == NANOS
    assert list(pda["ts_ms"]) == [t // 1_000_000 for t in NANOS]
    assert pda["ts_ts"].dt.floor("ms").iloc[0] == pd.Timestamp(NANOS[0] // 1_000_000, unit="ms")
