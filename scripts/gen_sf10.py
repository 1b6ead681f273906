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
    gen_sf1.SEED = 10042
    gen_sf1.DEFAULT_OUT = "/root/testdata_local/sf10"
    gen_sf1.N_CUSTOMER = 1_500_000
    gen_sf1.N_SUPPLIER = 100_000
    gen_sf1.N_PART = 2_000_000
    gen_sf1.N_ORDERS = 15_000_000
    gen_sf1.N_EVENTS = 10_000_000
    gen_sf1.N_USERS = 150_000
    gen_sf1.N_DOCS = 500_000
    gen_sf1.N_EMBED = 32_000  # sub-linear 4x/decade, like the driver's step
    return gen_sf1.main()


if __name__ == "__main__":
    raise SystemExit(main())
