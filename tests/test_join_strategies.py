"""Join physical-strategy coverage: the same logical join must run as
broadcast-hash at small scale AND degrade gracefully to sort-merge when
the build side exceeds the broadcast budget; bucketed tables co-locate
the join with no exchange at all (the 100 TB repeated-join pattern)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from gibbon_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_vs_sort_merge(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert "BroadcastHashJoin" in _plan(joined)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined2 = li.join(orders, li.l_orderkey == orders.o_orderkey)
        p2 = _plan(joined2)
        assert "SortMergeJoin" in p2 or "ShuffledHashJoin" in p2
        # same results either way
        assert joined2.count() == joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_db(spark):
    loc = tempfile.mkdtemp(prefix="gibbon_buckets_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{loc}'")
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bktdb.lineitem_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bktdb.orders_b")
    )
    return "bktdb"


def test_bucketed_join_has_no_shuffle(spark, bucketed_db):
    """Matching bucket counts on the join key → sort-merge join with
    ZERO exchanges: the layout 100 TB fact-fact joins rely on."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.table("bktdb.lineitem_b")
        orders = spark.table("bktdb.orders_b")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        join_section = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        # no Exchange feeding the join inputs (bucketing pre-shuffled them)
        pre_join = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning(l_orderkey" not in pre_join
        assert "Exchange hashpartitioning(o_orderkey" not in join_section
        # and the result matches the plain-table join
        plain = (
            load_table(spark, SF_SMALL, "lineitem")
            .join(
                load_table(spark, SF_SMALL, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert {(r.o_orderpriority, r.n) for r in joined.collect()} == {
            (r.o_orderpriority, r.n) for r in plain.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
