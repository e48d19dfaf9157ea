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
