"""Z-order layout operator (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gibbon_spark.operators.layout import cluster_by_zorder, zorder_key


def _morton2(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(3, 5), (0, 0), (255, 255), (170, 85), (1, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], bits=8).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y), (x, y)


def test_zorder_locality_bounds_both_dimensions(spark):
    """Cutting the 16-bit z-key space into 64 buckets must bound BOTH
    dimensions to <= 1/8 of their domain per bucket (8 bits each, top 6
    z-bits fix 3 high bits of each dimension -> span < 32)."""
    df = spark.range(0, 4096).select(
        (F.col("id") % 64 * 4 + 1).alias("x"), (F.col("id") * 7 % 256).alias("y")
    )
    z = df.select("x", "y", zorder_key(["x", "y"], bits=8).alias("z"))
    spans = (
        z.groupBy(F.shiftright("z", 10).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.max("sx").alias("mx"), F.max("sy").alias("my"))
        .first()
    )
    assert spans.mx < 32 and spans.my < 32, spans


def test_cluster_by_zorder_sorts_and_preserves_rows(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 13 % 256).alias("x"), (F.col("id") * 29 % 256).alias("y")
    )
    out = cluster_by_zorder(df, ["x", "y"], bits=8, num_partitions=4)
    assert out.columns == ["x", "y"]  # helper key dropped
    # within every partition the z-key must be non-decreasing (narrow
    # select preserves partition order, so collect() sees each
    # partition's rows contiguously and in order)
    rows = out.select(
        F.spark_partition_id().alias("p"), "x", "y"
    ).collect()
    assert len(rows) == 1000
    last: dict[int, int] = {}
    for r in rows:
        z = _morton2(r.x, r.y)
        assert z >= last.get(r.p, -1), (r.p, z)
        last[r.p] = z
    assert len(last) == 4
