from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from komodo_data_spark.schemas import DATA_SCHEMA  # noqa: E402
from komodo_data_spark.session import get_spark  # noqa: E402
from tests.synth import make_rows  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("komodo-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def data_pdf() -> pd.DataFrame:
    return pd.DataFrame(make_rows())


@pytest.fixture(scope="session")
def data_df(spark, data_pdf):
    df = spark.createDataFrame(data_pdf, schema=DATA_SCHEMA)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def oracle(data_pdf):
    """DuckDB connection with the reference-shaped `data` table registered."""
    con = duckdb.connect()
    con.register("data", data_pdf)
    return con


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def assert_frames_match(spark_df, oracle_pdf: pd.DataFrame, float_rel: float = 1e-9):
    """Order-insensitive comparison of a Spark result vs a DuckDB result."""
    got = spark_df.toPandas()
    assert list(got.columns) == list(oracle_pdf.columns), (
        f"columns differ: {list(got.columns)} vs {list(oracle_pdf.columns)}"
    )
    assert len(got) == len(oracle_pdf), f"row count {len(got)} vs {len(oracle_pdf)}"
    if len(got) == 0:
        return
    cols = list(got.columns)

    # Sort keys: non-float columns as-is; float columns rounded to a coarse
    # grid so rows whose float keys differ only by engine rounding can't order
    # differently between Spark and DuckDB (the rtol check below still
    # compares the full-precision values).
    def sort_frame(df: pd.DataFrame) -> pd.DataFrame:
        keyed = df.copy()
        key_cols = []
        for c in cols:
            if pd.api.types.is_float_dtype(df[c]):
                keyed[f"_k_{c}"] = df[c].round(6)
                key_cols.append(f"_k_{c}")
            else:
                key_cols.append(c)
        return (
            keyed.sort_values(key_cols, kind="mergesort")
            .reset_index(drop=True)[cols]
        )

    pd.testing.assert_frame_equal(
        sort_frame(got), sort_frame(oracle_pdf),
        check_dtype=False, check_exact=False, rtol=float_rel,
    )
