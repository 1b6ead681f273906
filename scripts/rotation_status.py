#!/usr/bin/env python
"""Driver-window rotation helper: which registry queries have never had a
driver-green CORRECTNESS row, and what the current first-50 window covers.

The driver records correctness for the FIRST 50 registry entries each
round; ``__spark_entry__._PRIORITY`` rotates that window. Run this before
editing _PRIORITY for a new round:

    python scripts/rotation_status.py

It prints (a) cumulative driver-witnessed names across all
CORRECTNESS_r*.json, (b) the current window, and (c) the queries still
waiting for a driver row — the pool the next rotation should draw from.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as e

    names = list(e.queries())
    window = names[:50]
    witnessed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        # a green oracle row has rows_match=True/err=None; the 3 rows-only
        # sketch queries are recorded as rows_match=None/err='no_oracle' —
        # that IS their strongest possible driver witness, so count it
        # (matching gen_registry_block.py) or they'd pin window slots forever
        witnessed |= {
            q
            for q, r in rows.items()
            if r.get("rows_match") is not False
            and r.get("err") in (None, "no_oracle")
        }
    projected = witnessed | set(window)
    waiting = [n for n in names if n not in projected]
    print(f"registry: {len(names)} queries")
    print(f"driver-witnessed so far: {len(witnessed)}")
    print(f"current window adds: {len(set(window) - witnessed)}")
    print(f"projected after this round: {len(projected)}")
    print(f"still waiting ({len(waiting)}):")
    for n in waiting:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
