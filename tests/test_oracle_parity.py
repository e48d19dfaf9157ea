"""Every registered query must match its DuckDB oracle at sf0.001 —
the same comparison the driver's t2 gate runs at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE


def _pairs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, name in oracles) for name in qs]


@pytest.mark.parametrize("name,has_oracle", _pairs(), ids=[n for n, _ in _pairs()])
def test_query_matches_oracle(spark, duck, name, has_oracle):
    from oracle_check import compare

    fn = entrymod.queries()[name]
    spark_pdf = fn(spark, SF_ORACLE).toPandas()
    if not has_oracle:
        # rows-only check (mirrors the driver's weaker gate)
        assert spark_pdf is not None
        return
    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "n_samples" in df.columns


def test_money_sum_presents_identically_at_1e13(spark, duck):
    """Round-in-decimal-space discipline (sf10 sweep find): the exact
    decimal sum 10116031050223.8550 casts to double ...223.85499…, and
    on that SAME bit pattern Spark's round(double, 2) answers .86 (it
    rounds the shortest decimal representation via BigDecimal.valueOf)
    while DuckDB answers .85 (it rounds the exact binary value) — a
    1-cent cross-engine split invisible below ~1e12 magnitudes (q1/q7/
    cube_orders at sf10). money_sum/money_sum_sql must therefore round
    in DECIMAL space and cast to double LAST, which both engines agree
    on at any magnitude."""
    from pyspark.sql import functions as F

    from gibbon_spark.queries import money_sum, money_sum_sql

    sdf = spark.createDataFrame(
        [(10116031050223.0,), (0.855,)], "v double"
    ).agg(money_sum(F.col("v")).alias("s"))
    got_spark = sdf.collect()[0]["s"]
    got_duck = duck.execute(
        "SELECT "
        + money_sum_sql("v")
        + " AS s FROM (VALUES (10116031050223.0), (0.855)) t(v)"
    ).fetchone()[0]
    assert got_spark == got_duck == 10116031050223.86
