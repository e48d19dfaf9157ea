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


def test_global_running_sum_empty_and_single(spark):
    from gibbon_spark.operators.ranking import global_running_sum

    empty = spark.createDataFrame([], "k long, x double")
    val = F.round(F.col("x") + F.lit(1e-9), 4).cast("decimal(24,4)")
    assert global_running_sum(empty, [F.asc("k")], val).count() == 0
    one = spark.createDataFrame([(1, 2.5)], "k long, x double")
    rows = global_running_sum(one, [F.asc("k")], val, out_col="rs").collect()
    assert len(rows) == 1 and float(rows[0].rs) == 2.5


def test_lsh_neardup_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.lsh_neardup_pairs(empty).count() == 0


def test_connected_components_no_edges(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(empty).count() == 0


def test_multimodal_decode_empty_and_single(spark):
    from gibbon_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "abc def ghi"), (1, "x y z"), (2, "k l m n")],
        "doc_id long, text string",
    )
    media = mm.documents_as_mixed_media(docs)
    img = {r.media_id: r for r in mm.decode_image(media).collect()}
    assert set(img) == {0}
    b = b"abc def ghi"
    meta = [r.meta for r in media.collect() if r.media_id == 0][0]
    n = meta.width * meta.height
    assert abs(
        img[0].mean_luma - sum(b[i % len(b)] for i in range(n)) / n
    ) < 1e-9
    aud = {r.media_id: r for r in mm.decode_audio(media).collect()}
    assert set(aud) == {1}
    assert aud[1].peak <= 127 and aud[1].rms >= 0.0
    fl = mm.sample_frame_luma(media).collect()
    assert all(r.media_id == 2 for r in fl) and len(fl) >= 1
    nothing = mm.decode_image(media.filter(F.col("media_id") < 0))
    assert nothing.count() == 0


def test_mixture_quota_feasibility(spark, sf_oracle_dir=None):
    """Quota invariants of sample_mixture_sources on the real table:
    every quota fits its pool, kept == quota, and the binding source
    (largest n_pool*w_sum/w ratio constraint) is within one doc of
    exhausting its pool."""
    from tests.conftest import SF_SMALL

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["sample_mixture_sources"](
        spark, SF_SMALL
    ).collect()
    assert rows, "mixture produced no sources"
    w_sum = sum(r.w for r in rows)
    n_mix = min((r.n_pool * w_sum) // r.w for r in rows)
    for r in rows:
        assert r.n_kept == r.k_quota <= r.n_pool
        assert r.k_quota == (r.w * n_mix) // w_sum
    binding = min(rows, key=lambda r: (r.n_pool * w_sum) // r.w)
    assert binding.n_pool - binding.k_quota <= 1
