"""MERGE / upsert and slowly-changing-dimension maintenance.

The reference's storage path is append-only (in-memory sink -> packed
blocks, johshoff/gibbon src/memory_sink.rs); a training-data warehouse
additionally needs *keyed* maintenance: upsert a batch of changed rows
into a standing table, and keep history when attributes drift (SCD
Type 2). Both are expressed as plain keyed joins so Catalyst picks the
physical strategy — sort-merge at 100 TB (both sides shuffle-partition
on the key, co-partitioning reused across the union branches), AQE
broadcast while the change batch is small. No hints: the change batch
grows with SF.

Everything here is deterministic (no processing-time columns) so the
result is oracle-replayable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE semantics with "source wins": rows whose key appears in
    ``source`` take the source values (WHEN MATCHED THEN UPDATE SET *),
    source-only keys are inserted (WHEN NOT MATCHED THEN INSERT *),
    target-only rows are kept. Columns must match.

    One shuffle per side on the key; the anti join and the union reuse
    the same hash partitioning, so the whole MERGE is a single exchange
    of each input at any scale.
    """
    cols = target.columns
    keep = target.join(source.select(*keys), on=list(keys), how="left_anti")
    return keep.select(*cols).unionByName(source.select(*cols))


def _differs(left: str, right: str, tracked: Sequence[str]) -> Column:
    """Null-safe row-difference predicate over the tracked columns."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return cond


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension Type 2 maintenance.

    ``dim`` carries (key, *tracked, version, is_current); ``updates``
    carries (key, *tracked). For every update whose tracked attributes
    differ from the key's current row, the current row is closed
    (is_current=false) and a new version is appended; updates equal to
    the current row are no-ops; unknown keys are inserted at version 1.
    History rows (is_current=false) pass through untouched.

    Plan shape: every join is an equi-join on the key, so all branches
    share one shuffle partitioning of each input; the history branch is
    a pure pass-through scan. Deterministic — no timestamps — so the
    output is exactly reproducible (and oracle-checkable) at any
    parallelism.
    """
    out_cols = [key, *tracked, "version", "is_current"]
    current = dim.filter(F.col("is_current")).alias("c")
    upd = updates.alias("u")

    matched = current.join(upd, on=F.col("c." + key) == F.col("u." + key))
    changed = matched.filter(_differs("u", "c", tracked)).select(
        F.col("c." + key).alias(key),
        *[F.col(f"u.{c}").alias(c) for c in tracked],
        (F.col("c.version") + F.lit(1)).alias("version"),
        F.lit(True).alias("is_current"),
    )
    closed = (
        current.join(
            changed.select(F.col(key).alias("_k")),
            on=F.col("c." + key) == F.col("_k"),
            how="left_semi",
        )
        .select(*out_cols)
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = current.join(
        changed.select(F.col(key).alias("_k")),
        on=F.col("c." + key) == F.col("_k"),
        how="left_anti",
    ).select(*out_cols)
    inserts = (
        upd.join(dim.select(F.col(key).alias("_k")),
                 on=F.col("u." + key) == F.col("_k"), how="left_anti")
        .select(
            F.col("u." + key).alias(key),
            *[F.col(f"u.{c}").alias(c) for c in tracked],
            F.lit(1).alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    history = dim.filter(~F.col("is_current")).select(*out_cols)
    return (
        history.unionByName(closed)
        .unionByName(untouched_current)
        .unionByName(changed)
        .unionByName(inserts)
    )
