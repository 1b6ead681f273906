"""Isolated A/B rig (BASELINE.md protocol): run each named query in a
FRESH Spark session — bench-style warm-up (parquet footers, Arrow pool,
one un-timed run of the query itself at sf0.001 for codegen) then ITERS
timed runs at the bench sf. Run this same script from a worktree at a
baseline commit and from HEAD to separate code effects from rig effects.

Usage: python scripts/ab_isolated.py query [query ...]
Prints one JSON line {query: [t1, t2, t3], ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

ITERS = 3


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:]

    from komodo_data_spark.session import get_spark

    spark = get_spark(
        app_name="ab-isolated",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    from komodo_data_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).count()
    spark.range(0, int(cpus)).mapInPandas(lambda i: i, schema="id long").count()

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, "/root/testdata/sf0.001").count()  # codegen warm-up
        except Exception:
            pass
        spark.catalog.clearCache()
        runs = []
        from komodo_data_spark.operators.model_memo import _MEMO

        for _ in range(ITERS):
            # each iteration pays the shared fits (the memo would serve
            # iteration 1's checkpoints to iterations 2..N otherwise)
            _MEMO.clear()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = runs
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
