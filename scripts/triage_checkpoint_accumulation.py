"""Round-10 triage: is the round-9 bench drift caused by localCheckpoint
block accumulation across a 236-query session (which
``spark.catalog.clearCache()`` does NOT release), or is it rig variance?

Design: one Spark session, four phases, all inside the SAME process so
ambient machine load affects every phase roughly equally — the comparison
is internal:

  1. FRESH:    warm up exactly like bench.py, then run the four suspect
               queries 3x each. This is the no-accumulated-state baseline.
  2. LOAD:     run a checkpoint-heavy slice of the registry once each with
               clearCache() after every query (bench.py's exact hygiene),
               accumulating whatever blocks clearCache leaves behind.
  3. LOADED:   re-run the four suspects 3x each. If accumulation is the
               mechanism, these times are materially worse than FRESH.
  4. RELEASED: unpersist every RDD still registered with the block manager
               (this is what clearCache misses: localCheckpoint persists
               its RDD outside the catalog's cache registry) + JVM gc,
               then re-run the suspects 3x. If LOADED was slow and
               RELEASED recovers to FRESH, the mechanism is confirmed AND
               the fix (block release in the bench loop) is validated.

Block-manager storage (RDD count / mem / disk bytes) is recorded at each
phase boundary via SparkContext.getRDDStorageInfo.

Output: one JSON document on stdout + scripts/triage_r10_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

SUSPECTS = (
    "text_bpe_merges",
    "dedup_simhash",
    "media_simhash_recall",
    "docs_stratified_sample",
)
ITERS = 3


def storage_info(spark) -> dict:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        "n_rdds": len(infos),
        "mem_bytes": int(sum(i.memSize() for i in infos)),
        "disk_bytes": int(sum(i.diskSize() for i in infos)),
        "cached_partitions": int(
            sum(i.numCachedPartitions() for i in infos)
        ),
    }


def release_all_blocks(spark) -> int:
    """Unpersist every RDD the block manager still tracks — including
    localCheckpoint storage that spark.catalog.clearCache() cannot see —
    then nudge the JVM so ContextCleaner drops dead references too."""
    jsc = spark.sparkContext._jsc
    m = jsc.getPersistentRDDs()  # py4j exposes the java Map as a dict view
    rdds = list(m.values())
    for rdd in rdds:
        rdd.unpersist(False)
    spark.sparkContext._jvm.System.gc()
    return len(rdds)


def timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from komodo_data_spark.session import get_spark

    spark = get_spark(
        app_name="triage-r10",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()

    # bench.py's exact warm-up (footers, arrow pool, codegen at sf0.001)
    from komodo_data_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).count()
    spark.range(0, int(cpus)).mapInPandas(lambda i: i, schema="id long").count()
    import bench as b

    warm_dir = b.WARMUP_SF_DIR if os.path.isdir(b.WARMUP_SF_DIR) else sf_dir
    for name, d in [(n, warm_dir) for n in b.WARMUP_QUERIES] + [
        (n, sf_dir) for n in b.WARMUP_AT_BENCH_SF
    ]:
        if name in qs:
            try:
                qs[name](spark, d).count()
            except Exception:
                pass
            spark.catalog.clearCache()

    result: dict = {"sf_dir": sf_dir, "cpus": int(cpus), "iters": ITERS}

    # Phase 1: FRESH
    result["storage_fresh_pre"] = storage_info(spark)
    result["fresh"] = {
        q: [timed(qs[q], spark, sf_dir) for _ in range(ITERS)]
        for q in SUSPECTS
    }
    result["storage_fresh_post"] = storage_info(spark)
    print("phase FRESH done:", json.dumps(result["fresh"]), flush=True)

    # Phase 2: LOAD — the registry prefix up to (but excluding) the
    # suspects, once each, clearCache after each, exactly like bench.py.
    # ~120 queries is enough to accumulate every iterative op's blocks.
    load_names = [n for n in qs if n not in SUSPECTS][:120]
    t0 = time.perf_counter()
    for n in load_names:
        try:
            qs[n](spark, sf_dir).count()
        except Exception as exc:
            print(f"load: {n} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
    result["load_n_queries"] = len(load_names)
    result["load_wall_s"] = round(time.perf_counter() - t0, 1)
    result["storage_loaded"] = storage_info(spark)
    print("phase LOAD done:", json.dumps(result["storage_loaded"]), flush=True)

    # Phase 3: LOADED
    result["loaded"] = {
        q: [timed(qs[q], spark, sf_dir) for _ in range(ITERS)]
        for q in SUSPECTS
    }
    result["storage_loaded_post"] = storage_info(spark)
    print("phase LOADED done:", json.dumps(result["loaded"]), flush=True)

    # Phase 4: RELEASED
    result["released_n_rdds"] = release_all_blocks(spark)
    time.sleep(2)  # let ContextCleaner drain
    result["storage_released"] = storage_info(spark)
    result["released"] = {
        q: [timed(qs[q], spark, sf_dir) for _ in range(ITERS)]
        for q in SUSPECTS
    }
    print("phase RELEASED done:", json.dumps(result["released"]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "triage_r10_result.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(result, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
