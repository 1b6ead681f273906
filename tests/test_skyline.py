"""Hand-computed pin for the skyline (Pareto front) operator: dominance
edge cases — exact duplicates (mutually non-dominating, both kept),
same-price strict-size dominance, equal-size strict-price dominance, and
points in different prefix buckets."""

from __future__ import annotations

import pandas as pd


def _write_parts(tmp_path, rows, name="sky_sf"):
    """rows: (p_partkey, price, size)."""
    pdf = pd.DataFrame(
        {
            "p_partkey": [r[0] for r in rows],
            "p_name": [f"part {r[0]}" for r in rows],
            "p_brand": ["B"] * len(rows),
            "p_type": ["T"] * len(rows),
            "p_size": pd.array([r[2] for r in rows], dtype="int32"),
            "p_retailprice": [float(r[1]) for r in rows],
        }
    )
    d = tmp_path / name
    d.mkdir()
    pdf.to_parquet(str(d / "part.parquet"))
    return str(d)


def test_skyline_dominance_edge_cases(spark, tmp_path):
    from komodo_data_spark.operators.tpch_extended import part_skyline

    rows = [
        (1, 1.0, 5),   # skyline
        (2, 1.0, 5),   # exact duplicate of 1: neither dominates -> kept
        (3, 2.0, 4),   # skyline (cheaper ones are all bigger)
        (4, 2.0, 6),   # dominated by (1.0, 5): <= both, strict in both
        (5, 1.0, 7),   # same price as 1, strictly bigger -> dominated
        (6, 0.5, 9),   # cheapest point -> skyline
        (7, 3.0, 4),   # equal size to 3 but strictly pricier -> dominated
        (8, 15.0, 1),  # other prefix bucket; smallest size -> skyline
        (9, 16.0, 1),  # equal size to 8, strictly pricier -> dominated
    ]
    d = _write_parts(tmp_path, rows)
    got = sorted(
        (r["p_partkey"], r["price"], r["size"])
        for r in part_skyline(spark, d).collect()
    )
    assert got == [
        (1, 1.0, 5),
        (2, 1.0, 5),
        (3, 2.0, 4),
        (6, 0.5, 9),
        (8, 15.0, 1),
    ]
