"""Physical-plan properties — the 100 TB checklist (driver brief):
filters pushed to the parquet scan, column pruning effective, dims
broadcast, top-k avoids a global sort. These assertions are the
mechanical form of ".explain and iterate until it's the plan you'd
want"."""

from __future__ import annotations

from pwir_zadanie_4_mapreduce_spark.operators.relational import (
    join_inner_orders_customer,
    q1_pricing_summary,
    q3_shipping_priority,
    q5_region_revenue,
    topk_global_orders,
)
from pwir_zadanie_4_mapreduce_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_codegen,
    has_pushed_filters,
    read_schema_columns,
)
from tests.conftest import SMOKE_SF


def test_q1_filter_pushed_to_scan(spark):
    df = q1_pricing_summary(spark, SMOKE_SF)
    assert has_pushed_filters(df), "l_shipdate predicate must reach the parquet scan"


def test_q1_column_pruning(spark):
    df = q1_pricing_summary(spark, SMOKE_SF)
    scans = read_schema_columns(df)
    assert scans, "expected a parquet scan"
    # lineitem has 11 columns; Q1 needs exactly 7
    assert all(len(cols) <= 7 for cols in scans), scans


def test_q3_broadcasts_dimensions(spark):
    assert has_broadcast_join(q3_shipping_priority(spark, SMOKE_SF))


def test_q5_broadcasts_dimensions(spark):
    assert has_broadcast_join(q5_region_revenue(spark, SMOKE_SF))


def test_inner_join_is_broadcast(spark):
    assert has_broadcast_join(join_inner_orders_customer(spark, SMOKE_SF))


def test_topk_no_global_sort(spark):
    plan = explain_str(topk_global_orders(spark, SMOKE_SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_q1_whole_stage_codegen(spark):
    df = q1_pricing_summary(spark, SMOKE_SF)
    df.collect()  # finalize the AQE plan — codegen spans appear post-execution
    assert has_codegen(df), explain_str(df)


def test_asof_join_is_join_free(spark):
    """The as-of operator must compile to union + one window pass —
    no join operator, no cartesian product, no pair explosion."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        join_asof_last_event_before_order,
    )

    plan = explain_str(join_asof_last_event_before_order(spark, SMOKE_SF))
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "Cartesian"):
        assert bad not in plan, f"as-of plan contains {bad}"
    assert "Window" in plan


def test_scalar_subquery_broadcasts_aggregate(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        subquery_scalar_small_qty,
    )

    assert has_broadcast_join(subquery_scalar_small_qty(spark, SMOKE_SF))


def test_salted_join_no_cartesian(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        join_salted_order_revenue,
    )

    plan = explain_str(join_salted_order_revenue(spark, SMOKE_SF))
    assert "Cartesian" not in plan
    assert "Generate" in plan, "expected the salt-replication explode"
