"""User-facing facade: the reference's whole workflow in a few calls.

A gibbon user does: read CSV → push into per-series compressed streams
→ run scan-aggregates (``examples/csv_to_packed.rs``). The equivalent
here::

    from gibbon_spark.engine import GibbonSpark

    eng = GibbonSpark()                      # or GibbonSpark(spark)
    ts = eng.ingest_csv("examples/test_data.csv")
    eng.summary(ts).show()                   # min/max/count/avg/max_ts
    eng.write_store(ts, "/data/store")       # 2h-bucketed parquet
    week = eng.read_store("/data/store", start="2017-06-01", end="2017-06-08")

    blocks = eng.encode_blocks(ts)           # bit-exact Gorilla blocks
    eng.compression_report(blocks).show()    # ratio vs 16 B/row
    eng.decode_blocks(blocks)                # back to rows

Everything returns plain DataFrames, so the full relational / window /
dedup / similarity surface composes on top.

Beyond the reference workflow, this module is the ONE import a
production user needs: every operator family ships as a module-level
re-export (see docs/API.md for the capability -> function -> registry
example map)::

    from gibbon_spark import engine as gs

    groups = gs.exact_dedup_groups(docs)
    pairs  = gs.minhash_lsh_pairs(docs, num_hashes=12, bands=4)
    hits   = gs.brute_force_topk(corpus, queries, k=10)
    joined = gs.salted_join(fact, dim, "key")
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

# -- production operator surface (re-exported; the facade IS the API) ----
from gibbon_spark.operators.dedup import (  # noqa: F401
    LSH_MAX_BUCKET,
    connected_components,
    containment_pairs_prefix,
    drop_exact_duplicates,
    exact_dedup_groups,
    jaccard_pairs_prefix,
    lsh_band_stats,
    lsh_candidate_pairs_cross,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_pairs,
)
from gibbon_spark.operators.layout import cluster_by_zorder, zorder_key  # noqa: F401
from gibbon_spark.operators.merge import merge_upsert, scd2_apply  # noqa: F401
from gibbon_spark.operators.ranking import global_running_sum  # noqa: F401
from gibbon_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    lsh_neardup_pairs,
    lsh_topk,
)
from gibbon_spark.operators.skew import (  # noqa: F401
    salted_distinct_count,
    salted_join,
    salted_summary,
)
from gibbon_spark.operators.timeseries import (  # noqa: F401
    asof_join,
    gap_fill,
    interpolate_linear,
    range_join,
    resample,
    topk,
)
from gibbon_spark.operators import timeseries as _ts
from gibbon_spark.session import get_spark
from gibbon_spark.sources import bucketed as _bucketed
from gibbon_spark.sources import csv_source as _csv


class GibbonSpark:
    """One engine handle bound to a SparkSession."""

    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or get_spark()

    # -- ingest ----------------------------------------------------------

    def ingest_csv(self, path: str, *, series_id: str = "default") -> DataFrame:
        """Reference CSV shape: headerless (epoch-seconds, value) rows."""
        return _csv.read_gibbon_csv(self.spark, path, series_id=series_id)

    def normalize(
        self,
        df: DataFrame,
        *,
        series: Sequence[str] | None = None,
        ts: str = "ts",
        value: str = "value",
    ) -> DataFrame:
        """Any table → canonical (series_id, ts, value) stream."""
        return _ts.as_timeseries(df, series=series, ts=ts, value=value)

    # -- storage (the Gorilla block layout) ------------------------------

    def write_store(
        self,
        df: DataFrame,
        path: str,
        *,
        series: list[str] | None = None,
        ts: str = "ts",
        value: str = "value",
    ) -> None:
        _bucketed.write_bucketed(df, path, series=series, ts=ts, value=value)

    def read_store(self, path: str, *, start=None, end=None) -> DataFrame:
        return _bucketed.read_bucketed(self.spark, path, start=start, end=end)

    def storage_stats(self, path: str) -> dict:
        return _bucketed.compression_stats(self.spark, path)

    def write_gorilla_store(self, blocks: DataFrame, path: str, **kw) -> None:
        """Persist encode_blocks() output as a day-partitioned table."""
        _bucketed.write_gorilla_store(blocks, path, **kw)

    def read_gorilla_store(self, path: str, **kw) -> DataFrame:
        """Scan a gorilla block store (block-pruned); decode_blocks() it."""
        return _bucketed.read_gorilla_store(self.spark, path, **kw)

    # -- the reference's query surface -----------------------------------

    def summary(self, df: DataFrame, **kw) -> DataFrame:
        """min/max/count/avg over value + max ts (csv_to_packed.rs:36-76)."""
        return _ts.summary(df, **kw)

    def summary_by_series(self, df: DataFrame, keys: Sequence[str], **kw) -> DataFrame:
        return _ts.summary_by_series(df, keys, **kw)

    def range_scan(self, df: DataFrame, **kw) -> DataFrame:
        return _ts.range_scan(df, **kw)

    def resample(self, df: DataFrame, keys: Sequence[str], **kw) -> DataFrame:
        return _ts.resample(df, keys, **kw)

    def gap_fill(self, df: DataFrame, series: Sequence[str], **kw) -> DataFrame:
        return _ts.gap_fill(df, series, **kw)

    def asof_join(self, left: DataFrame, right: DataFrame, on: Sequence[str], **kw) -> DataFrame:
        return _ts.asof_join(left, right, on, **kw)

    def with_delta(self, df: DataFrame, series: Sequence[str], **kw) -> DataFrame:
        return _ts.with_delta(df, series, **kw)

    def with_delta_of_delta(self, df: DataFrame, series: Sequence[str], **kw) -> DataFrame:
        return _ts.with_delta_of_delta(df, series, **kw)

    # -- bit-exact Gorilla codec -----------------------------------------

    def encode_blocks(
        self, df: DataFrame, *, series: list[str] | None = None, **kw
    ) -> DataFrame:
        from gibbon_spark.codec import spark_ops

        return spark_ops.encode_timeseries(df, series=series, **kw)

    def decode_blocks(self, blocks: DataFrame) -> DataFrame:
        from gibbon_spark.codec import spark_ops

        return spark_ops.decode_timeseries(blocks)

    def compression_report(self, blocks: DataFrame) -> DataFrame:
        from gibbon_spark.codec import spark_ops

        return spark_ops.compression_report(blocks)
