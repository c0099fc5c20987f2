"""B32–B34: the round-4 TPC-H breadth queries (Q7 volume shipping,
Q10 returned items, Q22-style missed opportunities).

These add the relational patterns the earlier surface lacked: a
both-ends-dimensioned deep join chain (Q7), a pushed-filter fact join
with top-k reporting (Q10), and scalar-subquery-broadcast + NOT EXISTS
anti-join (Q22 — the dual of B6's EXISTS semi-join).
"""

from __future__ import annotations

import mapreduceimplementation_spark as eng
from tests.conftest import assert_same_result, formatted_plan

eng.load_all_operators()


def test_q7_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["q7_volume_shipping"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["q7_volume_shipping"])


def test_q7_both_directions_present(spark, sf_dir):
    out = eng.QUERIES["q7_volume_shipping"](spark, sf_dir).toPandas()
    assert len(out) > 0
    # bilateral: supp/cust nation pairs must be distinct per row and both
    # orientations appear (the generator ships in both directions)
    pairs = set(zip(out["supp_nation"], out["cust_nation"]))
    assert all(a != b for a, b in pairs)
    assert {(a, b) for a, b in pairs} == {(b, a) for a, b in pairs}


def test_q7_nation_dims_broadcast(spark, sf_dir):
    plan = formatted_plan(eng.QUERIES["q7_volume_shipping"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q10_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["q10_returned_items"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["q10_returned_items"])


def test_q10_topk_is_take_ordered(spark, sf_dir):
    """Top-20 must compile to TakeOrderedAndProject (per-partition heaps),
    never a global sort of the aggregated relation."""
    plan = formatted_plan(eng.QUERIES["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_q10_filters_pushed(spark, sf_dir):
    """Both fact predicates (returnflag, orderdate window) must reach their
    parquet scans — at 100 TB these filters shrink the join ~25x."""
    plan = formatted_plan(eng.QUERIES["q10_returned_items"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters", 1)[1]


def test_q22_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["q22_missed_opportunities"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["q22_missed_opportunities"])


def test_q22_semantics(spark, sf_dir, duck):
    """Cross-check the unaggregated frontier: every counted customer has
    above-threshold balance and no recent order (the anti-join dual of
    B6's semi-join, checked row-by-row in DuckDB)."""
    import pandas as pd

    out = eng.QUERIES["q22_missed_opportunities"](spark, sf_dir).toPandas()
    total = int(out["numcust"].sum())
    frontier = duck.execute(
        """
        WITH thr AS (
            SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                         / COUNT(*), 6) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT count(*) FROM customer CROSS JOIN thr
        WHERE c_acctbal > avg_bal
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        """
    ).fetchone()[0]
    assert total == frontier
    assert (out["numcust"] > 0).all()
    assert isinstance(out, pd.DataFrame)


def test_q22_scalar_is_broadcast(spark, sf_dir):
    """The one-row threshold joins as a broadcast nested loop; the
    no-recent-order probe is an anti join — neither may be cartesian."""
    plan = formatted_plan(eng.QUERIES["q22_missed_opportunities"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_q14_matches_oracle(spark, sf_dir, duck):
    df = eng.QUERIES["q14_promo_revenue"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["q14_promo_revenue"])


def test_q14_share_bounds_and_pushdown(spark, sf_dir):
    out = eng.QUERIES["q14_promo_revenue"](spark, sf_dir).toPandas()
    assert len(out) == 1
    assert 0.0 <= out.loc[0, "promo_revenue_pct"] <= 100.0
    assert out.loc[0, "n_lines"] > 0
    plan = formatted_plan(eng.QUERIES["q14_promo_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1]


def test_events_value_histogram(spark, sf_dir, duck):
    """B36: oracle match + cells are a partition of all events (counts
    sum to the table count) and bins stay in [0, overflow]."""
    from mapreduceimplementation_spark.sources.tables import load_table

    df = eng.QUERIES["events_value_histogram"](spark, sf_dir)
    assert_same_result(df, duck, eng.ORACLES["events_value_histogram"])
    out = df.toPandas()
    total = load_table(spark, sf_dir, "events").count()
    assert out["n"].sum() == total
    assert out["bin"].between(0, 10).all()
    assert (out["bin_lo"] == out["bin"] * 50.0).all()
