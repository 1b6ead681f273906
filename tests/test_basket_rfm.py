"""Hand-computed pins for the market-basket and RFM operators: a 5-order
corpus whose only frequent pair (and its confidence/lift) is computable by
hand, and a 4-customer RFM ladder landing exactly one customer per
quartile score on every dimension."""

from __future__ import annotations

import pandas as pd


def test_market_basket_support_confidence_lift(spark, tmp_path):
    """Baskets {1,2,3} {1,2} {1,2} {2,3} {1}: only pair (1,2) reaches
    support 3 (1,3 has 1; 2,3 has 2). supp(1)=supp(2)=4 over 5 orders, so
    confidence 1→2 = 3/4 and lift = 3·5/(4·4). A duplicated lineitem row
    for (order 1, part 1) must collapse before counting."""
    from komodo_data_spark.operators.tpch_extended import parts_market_basket

    rows = [
        (1, 1), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 1), (3, 2),
        (4, 2), (4, 3),
        (5, 1),
    ]
    pdf = pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
        }
    )
    d = tmp_path / "mb_sf"
    d.mkdir()
    pdf.to_parquet(str(d / "lineitem.parquet"))
    got = parts_market_basket(spark, str(d)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["part_a"], r["part_b"]) == (1, 2)
    assert r["pair_support"] == 3
    assert r["supp_a"] == 4 and r["supp_b"] == 4
    assert abs(r["confidence_a_to_b"] - 0.75) < 1e-12
    assert abs(r["lift"] - 15.0 / 16.0) < 1e-12


def test_rfm_ladder_one_customer_per_score(spark, tmp_path):
    """Customer k has k orders, the latest on day k, totalling 10·k — so
    every dimension ranks the four customers identically and the QUINTILE
    scores are hand-computable from the integer bracket rule: cut ranks
    (3·i)/5 for i=1..4 are 0.6 / 1.2 / 1.8 / 2.4, so q1 ∈ (v0,v1),
    q2 and q3 both ∈ (v1,v2), q4 ∈ (v2,v3) — scores 1/2/4/5 (no customer
    lands on 3 with only four points) and segments 111/222/444/555."""
    from komodo_data_spark.operators.tpch_extended import customer_rfm_segments

    rows = []
    for cust in (1, 2, 3, 4):
        for k in range(cust):
            rows.append(
                (
                    len(rows) + 1,
                    cust,
                    pd.Timestamp(f"1998-01-0{cust}") - pd.Timedelta(days=k),
                    10.0 * cust / cust,  # each order 10.0 -> sum 10*cust
                )
            )
    pdf = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": [r[3] for r in rows],
            # timestamp[us] like the driver tables — pandas' default ns
            # precision would surface as a raw nanos LONG under the
            # session's nanosAsLong conf (an events-only convention)
            "o_orderdate": pd.Series(
                [r[2] for r in rows], dtype="datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    d = tmp_path / "rfm_sf"
    d.mkdir()
    pdf.to_parquet(str(d / "orders.parquet"))
    got = {
        r["o_custkey"]: r for r in customer_rfm_segments(spark, str(d)).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    expected_score = {1: 1, 2: 2, 3: 4, 4: 5}
    for cust in (1, 2, 3, 4):
        r = got[cust]
        assert r["frequency"] == cust
        assert abs(r["monetary"] - 10.0 * cust) < 1e-9
        s = expected_score[cust]
        assert r["segment"] == f"{s}{s}{s}", (cust, r)
