#!/usr/bin/env python
"""Repo-generated sf10 extrapolation: a THIRD measured scale decade.

Reuses scripts/gen_sf1.py's empirical-resampling generator (same method
notes apply — whole-row resampling from the driver's sf0.1 with fresh
dense key domains, synthesized documents/embeddings/event-timestamps)
with every fact-table cardinality one decade up. Embeddings follow the
driver's own sub-linear step one more time (4x per decade: 2k -> 8k ->
32k). Output ~1.7 GB parquet under ``/root/testdata_local/sf10/`` —
clearly repo-generated, never under the read-only driver dirs.

With sf0.01 -> sf0.1 (driver), sf0.1 -> sf1, and sf1 -> sf10 the
superlinearity gate in scripts/bench_scaling.py spans THREE measured
decades (1000x lineitem rows end to end): an operator whose exponent
misbehaves cannot hide a constant small enough to pass all three.

Deterministic: seed 10042 (distinct from sf1's 4242, so sf10 is a fresh
draw, not a superset — cross-scale joins between the two would be
meaningless anyway because both re-key their domains).

Usage: python scripts/gen_sf10.py [out_dir]  (default /root/testdata_local/sf10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_sf1  # noqa: E402


def main() -> int:
    # explicit config object, not module-global mutation (round-6 advice
    # finding): every size and the seed travel together, so a gen_sf1
    # refactor can never silently hand sf10 the sf1 parameters
    cfg = gen_sf1.GenConfig(
        out_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf10",
        seed=10042,
        label="sf10",
        n_customer=1_500_000,
        n_supplier=100_000,
        n_part=2_000_000,
        n_orders=15_000_000,
        n_events=10_000_000,
        n_users=150_000,
        n_docs=500_000,
        n_embed=32_000,  # sub-linear 4x/decade, like the driver's step
    )
    return gen_sf1.main(cfg)


if __name__ == "__main__":
    raise SystemExit(main())
