"""Dump ``explain("formatted")`` for named queries into plans/r12/.

Usage: python scripts/plans_r13.py before|after query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Round-13 deliverable: a ``<query>_before.txt`` / ``<query>_after.txt``
pair for every query the optimization round touched, captured at the
bench scale so plan claims in OPTIMIZATION_r13.md are checkable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from komodo_data_spark.plans.audit import formatted_plan
    from komodo_data_spark.session import get_spark

    spark = get_spark(
        app_name="plans-r13",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # keep going; a failed plan is itself news
            plan = f"PLAN FAILED: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
