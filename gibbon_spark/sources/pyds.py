"""Custom Python data source (Spark 4 DataSource API): a deterministic
time-series generator, the engine's analog of the reference's
``Reader`` extension trait (``/root/reference/src/stream.rs:6-8`` — the
only pluggable ingest point gibbon exposes). Where gibbon's trait
yields bits, Spark's API yields partitioned rows: ``partitions()``
declares the parallel splits and each split generates its slice
independently, so the source scales horizontally with no coordination.

Usage::

    spark.dataSource.register(GibbonSeriesDataSource)
    df = (spark.read.format("gibbon_series")
          .option("n", 1000).option("series", 4)
          .option("start", 1496366400).option("step", 60)
          .load())

Schema: series_id string, ts timestamp (UTC seconds), value double.
Values are a closed-form deterministic function of (series, i) so tests
and oracles can recompute them exactly: value = (i % 97) + series / 8.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _SeriesPartition(InputPartition):
    def __init__(self, series: int, lo: int, hi: int):
        self.series = series
        self.lo = lo
        self.hi = hi


class GibbonSeriesReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.series = int(options.get("series", 4))
        self.start = int(options.get("start", 1496366400))
        self.step = int(options.get("step", 60))
        self.splits = int(options.get("splitsperseries", 2))

    def partitions(self):
        out = []
        per = max(1, self.n // self.splits)
        for s in range(self.series):
            lo = 0
            while lo < self.n:
                hi = min(self.n, lo + per)
                out.append(_SeriesPartition(s, lo, hi))
                lo = hi
        return out

    def read(self, partition: _SeriesPartition):
        import datetime

        s = partition.series
        base = self.start
        for i in range(partition.lo, partition.hi):
            ts = datetime.datetime.fromtimestamp(
                base + i * self.step, tz=datetime.timezone.utc
            )
            yield (f"s{s}", ts, float(i % 97) + s / 8.0)


class GibbonSeriesDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gibbon_series"

    def schema(self):
        return "series_id string, ts timestamp, value double"

    def reader(self, schema):
        return GibbonSeriesReader(self.options)
