"""Distributed Gorilla codec: lossless round-trip, block layout,
deterministic payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gibbon_spark.codec import spark_ops
from gibbon_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMALL, "events").cache()


def test_roundtrip_is_lossless(spark, events):
    blocks = spark_ops.encode_timeseries(events, series=["user_id"])
    decoded = spark_ops.decode_timeseries(blocks)
    raw = events.select(
        F.col("user_id").cast("string").alias("series_id"),
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("ts"),
        "value",
    )
    sym_diff = decoded.exceptAll(raw).count() + raw.exceptAll(decoded).count()
    assert sym_diff == 0
    assert decoded.count() == events.count()


def test_block_per_series_bucket(spark, events):
    blocks = spark_ops.encode_timeseries(events, series=["user_id"]).cache()
    expected = (
        events.select(
            F.col("user_id").cast("string").alias("s"),
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 7200).alias("h"),
        )
        .distinct()
        .count()
    )
    assert blocks.count() == expected
    # block invariants: header 2h-aligned, payload sized to n_bits
    bad = blocks.filter(
        (F.col("header_time") % 7200 != 0)
        | (F.octet_length("payload") != F.ceil(F.col("n_bits") / 8))
    ).count()
    assert bad == 0


def test_encode_is_deterministic(spark, events):
    a = spark_ops.encode_timeseries(events, series=["user_id"])
    b = spark_ops.encode_timeseries(events, series=["user_id"])
    assert a.exceptAll(b).count() == 0


def test_compression_report(spark, events):
    blocks = spark_ops.encode_timeseries(events, series=["user_id"])
    row = spark_ops.compression_report(blocks).collect()[0]
    assert row.rows == events.count()
    assert row.raw_bytes == row.rows * 16
    assert 0 < row.ratio_pct
    # irregular microsecond-jitter data won't hit the paper's 12x, but
    # must still beat raw 16 B/row
    assert row.compressed_bytes < row.raw_bytes