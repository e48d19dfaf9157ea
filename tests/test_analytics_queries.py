"""Semantic invariants for the analytics/pipeline queries added on top
of the oracle hash-match (tests/test_oracle_parity.py): probability
normalization, salted-vs-direct equality, decontamination bounds."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from gibbon_spark.queries import _QUERIES
from tests.conftest import SF_SMALL


def test_event_transitions_probabilities_normalize(spark):
    rows = _QUERIES["event_transitions"](spark, SF_SMALL).collect()
    assert rows
    per_prev = defaultdict(float)
    for r in rows:
        assert r.n_transitions > 0
        per_prev[r.prev_type] += r.p_transition
    for prev, total in per_prev.items():
        # per-row 6-dp rounding → sum can be off by ~rows*5e-7
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_event_transitions_count_conservation(spark):
    out = _QUERIES["event_transitions"](spark, SF_SMALL)
    total = out.agg(F.sum("n_transitions")).collect()[0][0]
    from gibbon_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user contributes (len(sequence) - 1) transitions
    assert total == n_events - n_users


def test_skew_salted_agg_equals_direct_groupby(spark):
    salted = {
        r.event_type: r
        for r in _QUERIES["skew_salted_agg"](spark, SF_SMALL).collect()
    }
    from gibbon_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    r4 = F.round(F.col("value") + F.lit(1e-9), 4).cast("decimal(24,4)")
    direct = {
        r.event_type: r
        for r in ev.select("event_type", r4.alias("r4"))
        .groupBy("event_type")
        .agg(
            F.round(F.min("r4").cast("double"), 4).alias("min_value"),
            F.round(F.max("r4").cast("double"), 4).alias("max_value"),
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.sum("r4").cast("double"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert salted.keys() == direct.keys()
    for k, s in salted.items():
        d = direct[k]
        assert (s.min_value, s.max_value, s.n_samples, s.sum_value) == (
            d.min_value,
            d.max_value,
            d.n_samples,
            d.sum_value,
        ), k


def test_decontaminate_ngram_bounds_and_no_bench_docs(spark):
    rows = _QUERIES["decontaminate_ngram"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0 <= r.n_hit <= r.n_sh
        assert 0.0 <= r.contamination <= 1.0
        # benchmark members (hash-mod bucket 0 of 50) must not be scored
        bucket = int(
            spark.sql(
                "SELECT CAST(conv(substring(md5(CAST({i} AS STRING)), 1, 4), 16, 10)"
                " AS INT) % 50".format(i=r.doc_id)
            ).collect()[0][0]
        )
        assert bucket != 0, r.doc_id
