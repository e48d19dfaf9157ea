"""Stream-stream joins with bounded state.

The reference has no streaming join (its ingest is a single synchronous
writer — ``examples/csv_to_packed.rs:23-27``); this is part of the
engine surface a streaming TSDB needs. Spark's stream-stream inner join
keeps both sides' unmatched rows in state forever UNLESS the join
condition bounds event time on both sides — so the helper takes a
`within` bound, watermarks both inputs with it, and adds the time-range
conjunct. State per key is then O(rows within the watermark horizon),
which is what lets the join run indefinitely at production rates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    suffix: str = "_right",
) -> DataFrame:
    """Inner-join two streams on equal keys where the right row's event
    time is in ``[left_ts - within, left_ts]`` (e.g. "the purchase
    follows a click by the same user within 10 minutes" with left =
    purchases, right = clicks).

    Both sides are watermarked with ``within`` so Spark can evict
    state: a row older than the watermark can no longer match any
    future row under the range conjunct, and is dropped.
    """
    on = list(on)
    r = right
    for c in right.columns:
        if c not in on:
            r = r.withColumnRenamed(c, f"{c}{suffix}")
    rts = f"{right_ts}{suffix}" if right_ts not in on else right_ts
    lw = left.withWatermark(left_ts, within)
    rw = r.withWatermark(rts, within)
    cond = None
    for k in on:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    rng = (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {within}")) & (
        F.col(rts) <= F.col(left_ts)
    )
    cond = rng if cond is None else (cond & rng)
    joined = lw.join(rw, cond, "inner")
    # collapse the duplicated key columns from the raw condition join
    for k in on:
        joined = joined.drop(rw[k])
    return joined
