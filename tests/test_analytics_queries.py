"""Semantic invariants for the analytics/pipeline queries added on top
of the oracle hash-match (tests/test_oracle_parity.py): probability
normalization, salted-vs-direct equality, decontamination bounds."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

_QUERIES = entrymod.queries()


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


def test_streaming_sessions_equals_batch_sessionization(spark):
    stream_rows = {
        (r.user_id, r.session_start): r.n_events
        for r in _QUERIES["streaming_sessions"](spark, SF_SMALL).collect()
    }
    batch_rows = {
        (r.user_id, r.session_start): r.n_events
        for r in _QUERIES["ts_session_windows"](spark, SF_SMALL).collect()
    }
    assert stream_rows == batch_rows


def test_lexical_diversity_invariants(spark):
    rows = _QUERIES["text_lexical_diversity"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 < r.ttr <= 1.0
        assert 0.0 <= r.gini_diversity < 1.0
        # both sides 6-dp rounded → allow a one-ulp-of-rounding slack
        assert r.top_token_share >= 1.0 / r.n_types - 1e-6


def test_embedding_quantize_error_bounds(spark):
    rows = _QUERIES["embedding_quantize_error"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_vecs > 0
        # per-element error is at most scale/2; scale = max|x|/127, so
        # mse < (max|x|/254)^2 — tiny; just pin non-negativity + sanity
        assert 0.0 <= r.avg_mse < 1.0


def test_merge_upsert_source_wins(spark):
    from gibbon_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    source = spark.createDataFrame([(2, "B"), (4, "D")], ["k", "v"])
    out = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_scd2_merge_invariants(spark):
    rows = _QUERIES["merge_scd2_customers"](spark, SF_SMALL).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.c_custkey].append(r)
    for k, vs in by_key.items():
        current = [r for r in vs if r.is_current]
        assert len(current) == 1, k
        if k > 10000000:  # inserted keys: single fresh version
            assert len(vs) == 1 and vs[0].version == 1
            assert vs[0].segment == "AUTOMOBILE"
        elif k % 4 == 0:  # changed keys: closed v1 + current v2
            assert sorted((r.version, r.is_current) for r in vs) == [
                (1, False),
                (2, True),
            ]
        else:  # untouched and no-op keys: one current v1 row
            assert len(vs) == 1 and vs[0].version == 1


def test_pagerank_mass_and_floor(spark):
    rows = _QUERIES["pagerank_nations"](spark, SF_SMALL).collect()
    assert len(rows) == 25
    total = sum(r.pr_scaled for r in rows)
    # integer truncation + dangling mass only ever LOSE probability
    assert total <= 10**12
    base = 15 * 10**12 // (100 * 25)
    assert all(r.pr_scaled >= base for r in rows)
    assert total >= base * 25


def test_tfidf_top_terms_ranks(spark):
    rows = _QUERIES["tfidf_top_terms"](spark, SF_SMALL).collect()
    assert rows
    per_doc = defaultdict(list)
    for r in rows:
        assert 1 <= r.rnk <= 5
        assert r.df >= 1 and r.tf >= 1
        assert r.score > 0
        assert r.doc_id % 20 == 0
        per_doc[r.doc_id].append(r)
    for _, rs in per_doc.items():
        assert sorted(r.rnk for r in rs) == list(range(1, len(rs) + 1))
        scores = [r.score for r in sorted(rs, key=lambda r: r.rnk)]
        assert scores == sorted(scores, reverse=True)
