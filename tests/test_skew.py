"""Salted aggregation must equal direct aggregation, including on a
pathologically skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gibbon_spark.operators.skew import salted_distinct_count, salted_summary


@pytest.fixture(scope="module")
def skewed(spark):
    # one key owns ~90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 97).cast("double").alias("value"),
        (F.col("id") % 500).alias("u"),
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50)).alias("k"),
        (F.col("id") % 13).cast("double").alias("value"),
        (F.col("id") % 20).alias("u"),
    )
    return hot.unionByName(cold).cache()


def test_salted_summary_equals_direct(spark, skewed):
    direct = {
        r.k: (r.min_value, r.max_value, r.n_samples, r.sum_value)
        for r in skewed.groupBy("k")
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    salted = {
        r.k: (r.min_value, r.max_value, r.n_samples, r.sum_value)
        for r in salted_summary(skewed, ["k"]).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        dm, dM, dn, ds = direct[k]
        sm, sM, sn, ss = salted[k]
        assert (dm, dM, dn) == (sm, sM, sn)
        assert abs(ds - ss) < 1e-6  # association order differs


def test_salted_distinct_equals_direct(spark, skewed):
    direct = {
        r.k: r.n
        for r in skewed.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    salted = {
        r.k: r.n_distinct for r in salted_distinct_count(skewed, ["k"], "u").collect()
    }
    assert direct == salted


def test_salted_join_matches_plain_join(spark):
    from gibbon_spark.operators.skew import salted_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    # make key 0 hot: 60% of rows
    fact = fact.withColumn(
        "k", F.when(F.col("v") % 10 < 6, F.lit(0)).otherwise(F.col("k"))
    )
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(7)], "k long, name string"
    )
    got = salted_join(fact, dim, "k", salt_buckets=8).orderBy("v")
    want = fact.join(dim, "k").orderBy("v")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]
    # left join keeps unmatched fact rows
    dim_partial = dim.filter(F.col("k") < 3)
    got_l = salted_join(fact, dim_partial, "k", salt_buckets=8, how="left")
    want_l = fact.join(dim_partial, "k", "left")
    assert got_l.count() == want_l.count()
    assert (
        got_l.filter(F.col("name").isNull()).count()
        == want_l.filter(F.col("name").isNull()).count()
    )


@pytest.mark.parametrize("name", ["skew_salted_join", "skew_zipf_join"])
def test_salt_actually_applied_in_registered_plans(spark, name):
    """The registered skew queries must KEEP their salting: the executed
    plan has to show the dim-side salt explode and a join keyed on
    (key, _salt). If a refactor silently drops the salt, the query would
    still return correct rows (the oracle can't catch it) — this test
    is the gate."""
    import re

    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL

    plan = (
        entrymod.queries()[name](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate explode(" in plan, f"{name}: dim-side salt explode gone"
    assert re.search(r"Join \[[^\]]*_salt#\d+\]", plan), (
        f"{name}: join no longer keyed on (key, _salt)"
    )
