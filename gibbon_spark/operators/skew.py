"""Skew-mitigation helpers: two-phase salted aggregation.

AQE's skew-join splitting handles joins, but a pathological groupBy key
(one series with 10% of a 100 TB table) still funnels into one reducer.
The classic fix: salt the key into S shards, partially aggregate per
(key, salt), then combine the S partials — two small shuffles instead
of one skewed one. Works for any algebraic aggregate (sum/count/min/
max; avg via sum+count).

Spark note: hash aggregation already does map-side partial combine, so
salting only wins when a single key's *post-combine* partials still
overwhelm one reducer (hot key × many map tasks) or the aggregation
state per key is large (collect_list, exact distinct). Provided here as
the explicit operator for those cases.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_summary(
    df: DataFrame,
    keys: Sequence[str],
    *,
    value: str = "value",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-key min/max/count/sum/avg with a salt-sharded first phase.
    Result is identical to a direct groupBy (algebraic aggregates
    combine exactly; avg derived from sum/count so no averaging of
    averages)."""
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), salt_buckets)
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.min(value).alias("_min"),
        F.max(value).alias("_max"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(value).alias("_sum"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
            F.sum("_n").alias("n_samples"),
            F.sum("_sum").alias("sum_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_samples"))
    )


def salted_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact count-distinct per key without funnelling one key's whole
    value set through one reducer: shard phase-1 BY THE VALUE (same
    value → same shard, so cross-shard sets are disjoint and phase-2 can
    sum the per-shard distinct counts)."""
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(distinct_col)), salt_buckets)
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.countDistinct(distinct_col).alias("_d")
    )
    return partial.groupBy(*keys).agg(F.sum("_d").alias("n_distinct"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join for when AQE's skew splitting is unavailable
    (e.g. the build side is too big to broadcast AND one join key is
    hot): salt the FACT side into S shards and replicate the DIM side
    once per shard, so a hot key's rows spread over S reducers instead
    of one.

    Replication multiplies the dim shuffle by S — use only when dim ≪
    fact (the usual case for a hot-key dimension join). Result is
    row-identical to ``fact.join(dim, on, how)`` for 'inner'/'left'.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # pmod, NOT abs()%: abs(Int.MinValue) stays negative in non-ANSI
    # Spark, so for a non-power-of-two salt_buckets a ~2^-32/row slice of
    # fact rows would get a negative salt matching no replicated dim salt
    # and silently vanish from an inner join. pmod is always in [0, S).
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), salt_buckets)
    f = fact.withColumn("_salt", salt)
    explode_salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("_salt")
    d = dim.select("*", explode_salts)
    joined = f.join(d, [on, "_salt"], how)
    return joined.drop("_salt")
