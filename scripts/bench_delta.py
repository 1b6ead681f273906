"""Round-over-round bench comparison.

Usage: ``python scripts/bench_delta.py [OLD.json [NEW.json]]`` — OLD/NEW are
BENCH_DETAIL*.json snapshots. With no arguments, compares the two newest
per-round archives (``BENCH_DETAIL_r*.json``, written by bench.py alongside
the mutable BENCH_DETAIL.json); with one argument, NEW defaults to the
repo's current BENCH_DETAIL.json. Prints totals, the biggest per-query
regressions and improvements beyond a noise floor, and queries added/
removed. Exit code 1 if any query regressed by more than
REGRESSION_FACTOR× beyond the absolute noise floor — usable as a CI gate.

Note the ±10% run-to-run variance measured on this rig (bench.py module
docstring); the floors below are set above it.
"""

from __future__ import annotations

import glob
import json
import os
import sys

NOISE_FLOOR_SEC = 0.35  # ignore absolute deltas below this
REGRESSION_FACTOR = 1.5  # flag query if new >= old * factor (and above floor)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2:
        archives = sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json")))
        if len(archives) < 2:
            print(__doc__)
            print(f"(found {len(archives)} archive(s); need 2 for a default compare)")
            return 2
        old_path, new_path = archives[-2], archives[-1]
        print(f"comparing archives: {os.path.basename(old_path)} -> "
              f"{os.path.basename(new_path)}")
    else:
        old_path = sys.argv[1]
        new_path = (
            sys.argv[2]
            if len(sys.argv) > 2
            else os.path.join(REPO, "BENCH_DETAIL.json")
        )
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}

    print(f"old: {old['value']:.1f}s / {len(oq)} queries   "
          f"new: {new['value']:.1f}s / {len(nq)} queries")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added   ({len(added)}): "
              + ", ".join(f"{n} {nq[n]:.2f}s" for n in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    deltas = [
        (nq[k] - oq[k], k) for k in set(nq) & set(oq)
        if abs(nq[k] - oq[k]) >= NOISE_FLOOR_SEC
    ]
    regressions = [
        (d, k) for d, k in deltas
        if nq[k] >= oq[k] * REGRESSION_FACTOR
    ]
    for title, rows in (
        ("regressions", sorted(regressions, reverse=True)),
        ("slower", sorted((x for x in deltas if x[0] > 0), reverse=True)[:8]),
        ("faster", sorted(x for x in deltas if x[0] < 0)[:8]),
    ):
        if rows:
            print(f"{title}:")
            for d, k in rows:
                print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({d:+.2f}s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
