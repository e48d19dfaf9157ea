"""Shared-subtree materialization — the engine's single checkpoint
control point.

Many plans feed one computed frame into several consumers (a shingle
table read by both the banded join and the exact verify; a user-level
aggregate read by a global-moment pass and an adjustment join). Without
a materialization each consumer replays the subtree's scan + shuffles.
Every such site in the engine calls :func:`materialize` instead of
``DataFrame.localCheckpoint`` directly, so the storage strategy is a
deployment decision, not 31 scattered call sites:

* ``local`` (default) — ``localCheckpoint``: blocks on executor local
  storage, zero extra infra. Right for local[*] and for short jobs
  where recompute-on-executor-loss is acceptable. NOT fault-tolerant:
  the blocks are unreplicated executor state, so on a 1000-executor
  cluster a single executor loss fails the job instead of recomputing
  lineage.
* ``reliable`` — ``DataFrame.checkpoint`` into a durable checkpoint
  dir (HDFS/S3/...). The production setting for 100-TB runs: blocks
  survive executor loss. Set the dir via ``spark.gibbon.checkpoint.dir``
  (or pre-set ``sparkContext.setCheckpointDir``).
* ``off`` — pass-through (no materialization; consumers recompute the
  subtree). Used by the matched-load A/B harness to measure what a
  checkpoint actually buys at a given scale factor.

Mode resolution order: ``GS_CKPT_MODE`` env var (lets a fresh-session
A/B subprocess flip the mode without touching code), then the Spark
conf ``spark.gibbon.checkpoint.mode``, then ``local``.

Results are mode-invariant between ``local`` and ``reliable`` by
construction — those modes change WHERE blocks live, never values —
pinned by tests/test_materialize.py. ``off`` is a measurement-only
harness setting, NOT safe for correctness-gated runs: plans that join
consumers on ``spark_partition_id()`` after a ``repartitionByRange``
(global_running_sum, q_abtest_ks_distance, q_revenue_concentration)
rely on the checkpoint to pin the range exchange's sampled boundaries;
under ``off`` a recompute or task retry of the exchange can assign a
different partition id across consumers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

MODE_CONF = "spark.gibbon.checkpoint.mode"
DIR_CONF = "spark.gibbon.checkpoint.dir"


_VALID_MODES = frozenset({"local", "reliable", "off"})


def _mode(df: DataFrame) -> str:
    env = os.environ.get("GS_CKPT_MODE")
    if env:
        mode = env
    else:
        try:
            mode = df.sparkSession.conf.get(MODE_CONF, "local")
        except Exception:  # noqa: BLE001 — conf access never blocks the plan
            mode = "local"
    # a typo must fail loudly, not silently run the 'local' arm of an
    # A/B comparison (advisor r11: GS_CKPT_MODE=reliabe fell through)
    if mode not in _VALID_MODES:
        raise ValueError(
            f"invalid checkpoint mode {mode!r} (from GS_CKPT_MODE or "
            f"{MODE_CONF}); expected one of {sorted(_VALID_MODES)}"
        )
    return mode


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a multi-consumer subtree once (see module docstring).

    ``eager=False`` defers the cut to the first action — right when the
    frame may be consumed zero times on some code paths; ``eager=True``
    forces it now — right when the caller is about to fan out and wants
    the cost attributed up front (e.g. iterative loops pinning each
    round's frontier).
    """
    mode = _mode(df)
    if mode == "off":
        return df
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckpt_dir = df.sparkSession.conf.get(DIR_CONF, None)
            if not ckpt_dir:
                raise ValueError(
                    f"checkpoint mode 'reliable' needs {DIR_CONF} "
                    "(or a pre-set sparkContext checkpoint dir)"
                )
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
