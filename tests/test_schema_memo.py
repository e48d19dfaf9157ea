"""The load_table schema memo (r12): metadata-only, per-process, and
behaviorally invisible — load_table must return the same schema and
rows with the memo on, off, and across repeated calls."""

from __future__ import annotations

import os

from tests.conftest import SF_SMALL


def test_raw_schema_memoizes_per_table(spark):
    from gibbon_spark.sources import tables as T

    T._SCHEMA_CACHE.clear()
    s1 = T.raw_schema(spark, SF_SMALL, "orders")
    s2 = T.raw_schema(spark, SF_SMALL, "orders")
    assert s1 is s2, "second call must hit the memo"
    key = (os.path.abspath(SF_SMALL), "orders")
    assert key in T._SCHEMA_CACHE


def test_memo_off_env_bypasses_cache(spark, monkeypatch):
    from gibbon_spark.sources import tables as T

    T._SCHEMA_CACHE.clear()
    T.raw_schema(spark, SF_SMALL, "nation")
    monkeypatch.setenv("GS_SCHEMA_MEMO", "0")
    s2 = T.raw_schema(spark, SF_SMALL, "nation")
    # bypass still returns a correct schema (fresh inference each call)
    assert [f.name for f in s2.fields] == [
        f.name for f in T._SCHEMA_CACHE[(os.path.abspath(SF_SMALL), "nation")].fields
    ]


def test_load_table_identical_with_and_without_memo(spark, monkeypatch):
    from gibbon_spark.sources import tables as T

    monkeypatch.setenv("GS_SCHEMA_MEMO", "0")
    off = T.load_table(spark, SF_SMALL, "events")
    monkeypatch.setenv("GS_SCHEMA_MEMO", "1")
    on = T.load_table(spark, SF_SMALL, "events")
    assert off.schema == on.schema  # incl. the nanos->timestamp conversion
    o = sorted(map(tuple, off.limit(50).collect()))
    n = sorted(map(tuple, on.limit(50).collect()))
    assert o == n
