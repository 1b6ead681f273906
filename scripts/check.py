"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01 (override with argv[1]), compares row count, column names,
and order-insensitive values (floats rounded to 9 significant digits).

Usage: python scripts/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

EXPECTED_REGISTRY_COUNT = 255


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    cols = []
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            cols.append(
                [None if pd.isna(v) else float(f"{float(v):.9g}") for v in df[c]]
            )
        else:
            cols.append([None if pd.isna(v) else str(v) for v in df[c]])
    return sorted(zip(*cols), key=lambda t: tuple(map(str, t))) if cols else []


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from komodo_data_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    # Backstop against a pack silently vanishing from the registry: the gate
    # must fail loudly if the query count ever shrinks.
    assert len(qs) >= EXPECTED_REGISTRY_COUNT, (
        f"registry shrank: {len(qs)} < {EXPECTED_REGISTRY_COUNT}"
    )
    # SURVEY §8.3 is generated from this registry; fail if it drifted so a
    # registry edit can never ship without the regenerated index.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gen_registry_block as grb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    survey = open(os.path.join(repo, "SURVEY.md")).read()
    assert grb.registry_table() in survey, (
        "SURVEY.md §8.3 registry table is stale — "
        "run scripts/gen_registry_block.py in the same commit"
    )

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # per-query cache hygiene (bench.py does the same): the recall
        # twins and prefix-join ops cache postings/truth frames per
        # invocation; without this, a 223-query sweep accumulates caches
        # and leans on LRU eviction.
        spark.catalog.clearCache()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"okR  {name}: rows-only ({len(got)})")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            failed.append(name)
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failed.append(name)
            continue
        g, x = canon(got), canon(exp)
        if g != x:
            bad = next(i for i, (a, b) in enumerate(zip(g, x)) if a != b)
            print(f"FAIL {name}: values differ; first at {bad}:\n  spark : {g[bad]}\n  oracle: {x[bad]}")
            failed.append(name)
            continue
        print(f"ok   {name}: {len(got)} rows match")
    print(f"\n{len(failed)} failed" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
