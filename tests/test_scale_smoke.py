"""Scale smoke: 5M synthetic series rows through the core operators in
bounded time. Catches egregious plan regressions (accidental cartesian,
driver collect, per-row Python) that small-SF tests can hide."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from gibbon_spark.operators.timeseries import resample, summary_by_series

N = 5_000_000
SERIES = 1000


@pytest.fixture(scope="module")
def big(spark):
    # 1000 series, ~60s cadence with deterministic jitter, value = noisy walk
    df = (
        spark.range(N)
        .select(
            (F.col("id") % SERIES).cast("string").alias("series_id"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + (F.col("id") / SERIES).cast("long") * 60
                + F.col("id") % 17
            ).alias("ts"),
            (F.sin(F.col("id") / 1000.0) * 100 + (F.col("id") % 997)).alias("value"),
        )
    )
    return df


def test_summary_by_series_5m(spark, big):
    t0 = time.time()
    out = summary_by_series(big, ["series_id"])
    assert out.count() == SERIES
    elapsed = time.time() - t0
    assert elapsed < 60, f"5M-row groupBy took {elapsed:.0f}s"


def test_hourly_resample_5m(spark, big):
    t0 = time.time()
    out = resample(big, ["series_id"], every="1 hour")
    n = out.count()
    assert n > SERIES  # many hourly buckets per series
    elapsed = time.time() - t0
    assert elapsed < 90, f"5M-row resample took {elapsed:.0f}s"


def test_window_delta_5m(spark, big):
    from gibbon_spark.operators.timeseries import with_delta

    t0 = time.time()
    out = with_delta(big, ["series_id"])
    # aggregate the deltas so the window actually evaluates everywhere
    row = out.agg(F.count("delta").alias("n"), F.avg("delta").alias("a")).collect()[0]
    assert row.n == N - SERIES  # first row per series has null delta
    assert abs(row.a - 60.0) < 1.0
    elapsed = time.time() - t0
    assert elapsed < 120, f"5M-row window took {elapsed:.0f}s"


def test_range_join_5m(spark, big):
    """Bucketized range join at 5M points x 500 intervals: must stay an
    equi-join (no BNLJ explosion) and finish in bounded time."""
    from gibbon_spark.operators.timeseries import range_join

    iv = spark.range(500).select(
        F.col("id").alias("iv_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 600).alias("w_start"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 600 + 600).alias("w_end"),
    )
    t0 = time.time()
    out = range_join(big, iv, bucket="10 minutes")
    n = out.groupBy("iv_id").count().count()
    elapsed = time.time() - t0
    assert n == 500
    assert elapsed < 90, f"5M-row range join took {elapsed:.0f}s"
