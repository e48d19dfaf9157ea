"""Every registered query's physical plan must stay free of scale
anti-patterns (tools/explain_audit.py, enforced)."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

# keep in sync with tools/explain_audit.py:ALLOWED_NESTED_LOOP
ALLOWED_NESTED_LOOP = {
    "sim_topk_lsh",
    "q11_important_stock",
    "tfidf_top_terms",
    "bm25_search",
    "token_drift_splits",
    "equi_depth_bins",
    "basket_part_pairs",
    "heavy_hitters_mg",
    "skew_key_stats",
    "graph_triangle_count",
    "embedding_top_pc",
    "bootstrap_ci_revenue",
    "abtest_value_z",
    "abtest_cuped",
    "orders_seasonal_index",
    "benford_digit_audit",
    "rfm_segments",
    "abtest_ks_distance",
    "text_unigram_fluency",
    # two 1-row aggregate frames cross-joined — O(1)
    "events_attribution_linear",
    "orders_seasonal_anomaly",
}


@pytest.mark.parametrize("name", list(entrymod.queries()))
def test_plan_has_no_antipatterns(spark, name):
    df = entrymod.queries()[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested loop join"
    # Arrow-batched python (ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas)
    # is the sanctioned slow path; row-at-a-time BatchEvalPython never is
    assert not re.search(r"\bBatchEvalPython\b", plan), f"{name}: row python UDF"
