"""End-to-end facade flow: the reference user's workflow
(csv_to_packed.rs) in engine calls, including against the reference's
own example data values."""

from __future__ import annotations

import os
import tempfile

import pytest

from gibbon_spark.engine import GibbonSpark

# first rows of the reference's examples/test_data.csv shape:
# 60s-ish cadence, small integer-valued doubles
SAMPLE = [
    (1496366523, 20.0),
    (1496366583, 21.0),
    (1496366643, 21.0),
    (1496366703, 23.0),
    (1496366763, 19.0),
    (1496366823, 19.0),
]


@pytest.fixture(scope="module")
def eng(spark):
    return GibbonSpark(spark)


@pytest.fixture(scope="module")
def csv_path():
    d = tempfile.mkdtemp(prefix="gibbon_facade_")
    p = os.path.join(d, "data.csv")
    with open(p, "w") as f:
        for ts, v in SAMPLE:
            f.write(f"{ts},{v}\n")
    return p


def test_reference_workflow(eng, csv_path):
    ts = eng.ingest_csv(csv_path)
    row = eng.summary(ts).collect()[0]
    assert row.min_value == 19.0
    assert row.max_value == 23.0
    assert row.n_samples == 6
    assert abs(row.avg_value - sum(v for _, v in SAMPLE) / 6) < 1e-12
    assert row.max_ts.timestamp() == 1496366823


def test_store_roundtrip_with_range(eng, csv_path):
    ts = eng.ingest_csv(csv_path)
    store = tempfile.mkdtemp(prefix="gibbon_facade_store_") + "/s"
    eng.write_store(ts, store)
    back = eng.read_store(store)
    assert back.count() == len(SAMPLE)
    stats = eng.storage_stats(store)
    assert stats["rows"] == len(SAMPLE)
    ranged = eng.read_store(
        store, start="2017-06-02 01:23:00", end="2017-06-02 01:25:10"
    )
    assert ranged.count() == 3  # 01:23:03, 01:24:03, 01:25:03 UTC


def test_codec_path(eng, csv_path):
    ts = eng.ingest_csv(csv_path)
    blocks = eng.encode_blocks(ts)
    rep = eng.compression_report(blocks).collect()[0]
    assert rep.rows == len(SAMPLE)
    # regular small-int series: far below raw 16 B/row
    assert rep.compressed_bytes < rep.raw_bytes / 3
    decoded = eng.decode_blocks(blocks)
    got = sorted((r.ts, r.value) for r in decoded.collect())
    assert got == [(t, v) for t, v in SAMPLE]


def test_delta_analytics(eng, csv_path):
    ts = eng.ingest_csv(csv_path)
    out = eng.with_delta_of_delta(ts, ["series_id"]).orderBy("ts").collect()
    assert [r.delta for r in out] == [None, 60, 60, 60, 60, 60]
    assert [r.dod for r in out][2:] == [0, 0, 0, 0]


def test_facade_is_the_one_import_surface(spark):
    """docs/API.md contract: a production user imports ONLY
    gibbon_spark.engine and gets every operator family. Exercises one
    call per family on tiny frames."""
    from pyspark.sql import functions as F

    from gibbon_spark import engine as gs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    assert gs.exact_dedup_groups(docs).count() == 2
    assert gs.jaccard_pairs_prefix(docs, n=2, threshold=0.8).count() == 1
    assert gs.minhash_lsh_pairs(docs, num_hashes=4, bands=2).count() >= 1

    fact = spark.range(100).select((F.col("id") % 5).alias("k"), "id")
    dim = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    assert gs.salted_join(fact, dim, "k", salt_buckets=4).count() == 100

    run = gs.global_running_sum(
        spark.range(10).select("id", F.lit(1).alias("one")),
        [F.col("id")],
        F.col("one"),
    )
    assert run.agg(F.max("running_sum")).first()[0] == 10

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    qset = vecs.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = gs.brute_force_topk(vecs, qset, k=3)
    assert hits.count() == 3

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    merged = gs.merge_upsert(base, upd, ["k"])
    assert {r.v for r in merged.collect()} == {"a", "B", "c"}
