"""Text-analysis function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from gibbon_spark.functions import text as tx


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_token_counts(spark):
    df = _one(spark, "hello world  foo")
    row = df.select(
        tx.token_count("text").alias("n"),
        tx.bpe_ish_token_count("text").alias("b"),
    ).collect()[0]
    assert row.n == 3  # \s+ split collapses the double space
    assert row.b == 3


def test_bpe_ish_splits_mixed(spark):
    row = (
        _one(spark, "GPT-4 costs $20/mo!")
        .select(tx.bpe_ish_token_count("text").alias("b"))
        .collect()[0]
    )
    # GPT / - / 4 / costs / $ / 20 / / / mo / !
    assert row.b == 9


def test_lang_id_picks_profile(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house", "en"),
            ("el perro y la casa de los gatos del pueblo", "es"),
            ("der hund und die katze von den bergen mit uns", "de"),
        ],
        "text string, expected string",
    )
    rows = df.select("expected", tx.lang_id("text").alias("pred")).collect()
    for r in rows:
        assert r.pred == r.expected


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",)], "text string"
    )
    fps = [r.fp for r in df.select(tx.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_rolling_fingerprint_survives_tail_edit(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    edited = base + " extra"
    df = spark.createDataFrame([(base,), (edited,)], "text string")
    fps = [
        r.fp
        for r in df.select(tx.rolling_fingerprint("text", window=8).alias("fp")).collect()
    ]
    # min-shingle fingerprint is often stable under a tail append
    # (changes only if the new shingle is the new minimum)
    assert fps[0] is not None and fps[1] is not None


def test_quality_score_orders_sensibly(spark):
    df = spark.createDataFrame(
        [
            ("good", "the quick brown fox and the lazy dog walked to the market in town for apples and bread"),
            ("noisy", ",,,!!! ??? ::: ;;; ... 12345 67890 !!!"),
        ],
        "kind string, text string",
    )
    rows = {
        r.kind: r.q
        for r in df.select("kind", tx.quality_score("text").alias("q")).collect()
    }
    assert rows["good"] > rows["noisy"]
