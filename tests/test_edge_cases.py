"""Edge inputs the driver's tables never exercise: empty frames,
single rows, empty/whitespace text, zero vectors."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gibbon_spark.operators import dedup, similarity
from gibbon_spark.operators.timeseries import (
    asof_join,
    gap_fill,
    summary,
    with_delta_of_delta,
)


def _empty_ts(spark):
    return spark.createDataFrame([], "series_id string, ts timestamp, value double")


def test_summary_of_empty(spark):
    row = summary(_empty_ts(spark)).collect()[0]
    assert row.n_samples == 0
    assert row.min_value is None and row.max_ts is None


def test_window_ops_on_empty(spark):
    df = _empty_ts(spark)
    assert with_delta_of_delta(df, ["series_id"]).count() == 0
    assert gap_fill(df, ["series_id"]).count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "k string, ts timestamp, value double",
    )
    right = spark.createDataFrame([], "k string, ts timestamp, rv double")
    out = asof_join(left, right, ["k"]).collect()
    assert len(out) == 1
    assert out[0].rv_right is None


def test_single_point_series(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 5.0)],
        "series_id string, ts timestamp, value double",
    )
    out = with_delta_of_delta(df, ["series_id"]).collect()[0]
    assert out.delta is None and out.dod is None
    grid = gap_fill(df, ["series_id"]).collect()
    assert len(grid) == 1 and grid[0].filled_value == 5.0


def test_dedup_on_degenerate_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "one"), (4, "one")],
        "doc_id long, text string",
    )
    groups = {r.representative: r.n_copies for r in dedup.exact_dedup_groups(docs).collect()}
    # "" and " " normalize to the same empty content
    assert groups[1] == 2
    assert groups[3] == 2
    # shingle ops must not blow up on degenerate docs
    assert dedup.minhash_signatures(docs).count() == 4
    assert dedup.simhash(docs).count() == 4


def test_similarity_zero_vector(spark):
    embs = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    # zero vector must not produce NaN/div-by-zero (norm clamped to 1)
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in similarity.pairwise_cosine_pairs(
            embs, threshold=0.9, num_blocks=2
        ).collect()
    }
    assert pairs == {(1, 2): 1.0}
