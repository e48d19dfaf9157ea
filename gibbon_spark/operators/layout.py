"""Multi-dimensional clustering layout (z-order / Morton interleave).

The reference's only layout device is the 2-hour header-time bucket
(`csv_to_packed.rs:17`) — one-dimensional block addressing: a time-range
query skips whole blocks. At 100 TB a fact table is filtered on more
than one column (partkey AND suppkey, series AND time, ...), and a sort
on one key leaves the others scattered across every file. Z-ordering
interleaves the bits of several keys into one sort key so that a
contiguous key range maps to a small hyper-rectangle in every dimension
— parquet min/max page stats then prune on ALL interleaved columns, the
multi-dimensional generalization of the reference's header-time
addressing.

Everything here is a pure codegen column expression (shifts, masks,
adds — no UDF, no shuffle); `cluster_by_zorder` adds exactly one range
shuffle, the same cost as any global sort, paid once at write time.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each column into one
    long. Callers bound each dimension first (e.g. ``col % 256`` or a
    width_bucket) — values must fit in ``bits`` bits for the locality
    guarantee to hold. Dimension d contributes its bit i at output
    position ``i * k + d``, so truncating the key from the top shrinks
    every dimension's range equally."""
    k = len(cols)
    assert k >= 2, "z-order needs at least two dimensions"
    assert bits * k <= 63, "interleaved key must fit in a long"
    dims = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = [
        F.shiftleft(F.shiftright(dim, i).bitwiseAND(F.lit(1)), i * k + d)
        for d, dim in enumerate(dims)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key_sql(exprs: Sequence[str], bits: int = 8) -> str:
    """Oracle twin of :func:`zorder_key` — the identical bit arithmetic
    as ANSI SQL (DuckDB `>>`/`<<`/`&`), generated from the same loop so
    the two sides cannot drift."""
    k = len(exprs)
    terms = [
        f"(((({e}) >> {i}) & 1) << {i * k + d})"
        for d, e in enumerate(exprs)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[Column | str],
    *,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Physically cluster ``df`` for multi-column data skipping: range-
    partition + sort by the interleaved key, then drop it. Write the
    result with ``.write.parquet`` and every interleaved column gets
    tight min/max stats per file AND per page. One range shuffle
    (sampled boundaries balance skew); sort is per-partition."""
    zkey = zorder_key(cols, bits=bits).alias("__zkey")
    out = df.withColumn("__zkey", zkey)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__zkey")
    else:
        out = out.repartitionByRange("__zkey")
    return out.sortWithinPartitions("__zkey").drop("__zkey")
