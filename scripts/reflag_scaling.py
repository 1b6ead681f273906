"""Re-classify an existing BENCH_SCALING.json under the CURRENT gate
definitions without re-timing anything.

Why this exists (round 10): gate definitions evolve with the engine —
the guard-refusal classification and the candidate-normalized exemption
(CANDIDATE_COST_BY_DATA) both postdate measurements taken the same
session. Raw measurements are never edited here: this script reloads the
stored per-query times/rows, re-runs ONLY the classification logic
imported from bench_scaling (same constants, same dicts), re-measures the
candidate volumes the new gate needs (one aggregate per scale — the same
estimate the operator guard runs), and rewrites the flags/exemption
fields. The output records ``reflagged_from`` so the provenance is on
the artifact itself.

Usage: python scripts/reflag_scaling.py [path=BENCH_SCALING.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SCALING.json"
    )
    import bench_scaling as bs

    with open(path) as fh:
        doc = json.load(fh)
    queries = doc["queries"]

    from komodo_data_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="komodo-reflag",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    cand_vol: dict = {}
    if any(n in queries for n in bs.CANDIDATE_COST_BY_DATA):
        from komodo_data_spark.operators import dedup as _dd

        for sfd, key in ((bs.SF_LARGE, "sf0.1"), (bs.SF_XL, "sf1")):
            posts = _dd._doc_postings(spark, sfd).cache()
            cand_vol[key] = _dd.prefix_candidate_volume(
                _dd._prefix_postings(posts, 7, 10)
            )
            posts.unpersist()
            spark.catalog.clearCache()

    flagged = bs.classify_flags(queries, cand_vol)

    doc["flagged"] = flagged
    doc["n_flagged"] = len(doc["flagged"])
    doc["reflagged_from"] = "same-session measurements; classification " \
        "re-run under the round-10 gate set (guard refusals + " \
        "CANDIDATE_COST_BY_DATA); raw times untouched"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"flagged": doc["flagged"], "cand_vol": cand_vol}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
