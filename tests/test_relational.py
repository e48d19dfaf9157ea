"""Relational odds and ends not covered by the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_approx_distinct_within_5pct(spark):
    from gibbon_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.10  # HLL++ default rsd is 5%; small groups wobble


def test_q1_plan_pushes_filter_and_prunes_columns(spark):
    """The scan under Q1 must show a pushed shipdate filter and a pruned
    schema (no scan of unused columns) — the .explain contract from the
    build brief."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q1_pricing_summary"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]  # pruned


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["orders_topk"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_dims(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q5_region_revenue"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
