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

    def norm_ratio(t_hi, n_hi, t_lo, n_lo):
        if None in (t_hi, t_lo, n_hi, n_lo):
            return None
        if min(t_hi, t_lo) <= 0 or min(n_hi, n_lo) <= 0:
            return None
        return round((t_hi / n_hi) / (t_lo / n_lo), 2)

    flagged = []
    for name, q in queries.items():
        ts, tl = q["t_sf0.01"], q["t_sf0.1"]
        if (ts < 0 and ts != -2.0) or (tl < 0 and tl != -2.0):
            flagged.append(name)
        elif q.get("ratio") is not None and q["ratio"] > bs.RATIO_GATE and (
            ts > bs.T01_FLOOR or tl > bs.T_ABS_CEILING
        ):
            flagged.append(name)
        if "t_sf1" in q:
            txl = q["t_sf1"]
            ratio1 = q.get("ratio_sf1")
            if name in bs.OUTPUT_QUADRATIC_BY_DATA:
                nr1 = q.get("norm_ratio_sf1")
                if nr1 is not None and nr1 > bs.NORM_RATIO_GATE \
                        and name not in flagged:
                    flagged.append(name)
            if name in bs.CANDIDATE_COST_BY_DATA and cand_vol:
                q["gate_exempt"] = bs.CANDIDATE_COST_BY_DATA[name]
                q["cand_sf0.1"] = cand_vol["sf0.1"]
                q["cand_sf1"] = cand_vol["sf1"]
                ncand = norm_ratio(
                    txl, cand_vol["sf1"], tl, cand_vol["sf0.1"]
                )
                q["norm_ratio_per_candidate_sf1"] = ncand
                if ncand is not None and ncand > bs.NORM_RATIO_GATE \
                        and name not in flagged:
                    flagged.append(name)
            if txl < 0 and txl != -2.0 and name not in flagged:
                flagged.append(name)
            elif ratio1 is not None and ratio1 > bs.RATIO_GATE and (
                tl > bs.T01_FLOOR or txl > bs.T_SF1_CEILING
            ) and name not in flagged \
                    and name not in bs.OUTPUT_QUADRATIC_BY_DATA \
                    and name not in bs.CANDIDATE_COST_BY_DATA:
                flagged.append(name)
        if "t_sf10" in q:
            txxl = q["t_sf10"]
            txl = q.get("t_sf1", -1.0)
            ratio10 = q.get("ratio_sf10")
            if name in bs.OUTPUT_QUADRATIC_BY_DATA:
                nr10 = q.get("norm_ratio_sf10")
                if nr10 is not None and nr10 > bs.NORM_RATIO_GATE \
                        and name not in flagged:
                    flagged.append(name)
            if txxl < 0 and txxl != -2.0 and name not in flagged:
                flagged.append(name)
            elif ratio10 is not None and ratio10 > bs.RATIO_GATE and (
                txl > bs.T01_FLOOR or txxl > bs.T_SF10_CEILING
            ) and name not in flagged \
                    and name not in bs.OUTPUT_QUADRATIC_BY_DATA:
                flagged.append(name)

    doc["flagged"] = sorted(set(flagged))
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
