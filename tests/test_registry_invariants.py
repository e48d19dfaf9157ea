"""Pins the driver-contract registry machinery (round-8 verdict ask #6).

The rotation window (queries.PRIORITY_WINDOW) is load-bearing for
driver-hash verification: the driver samples the FIRST 50 dict entries
of queries() for its correctness gate. These invariants make a silent
regression (a dropped registration, a typo'd window name, a rows-only
query drifting into the sampled window) a pytest failure instead of a
burned driver round.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from gibbon_spark.queries import PRIORITY_WINDOW

# Registered query count as of round 9: 231 queries, 229 oracle-backed
# (228 from round 8 + the sim_topk_ivf conversion — its codebook now
# trains RNG-free, so the full index is SQL-replayable) and 2 rows-only
# (agg_approx_distinct, percentiles_approx — the genuinely
# sketch-internal ones, each with an oracle-backed invariant twin).
# Update BOTH constants when adding queries; never let them drift down.
EXPECTED_TOTAL = 231
EXPECTED_ORACLE_BACKED = 229
DRIVER_SAMPLE = 50


def test_registry_size_pinned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) == EXPECTED_TOTAL, (
        f"registry has {len(qs)} queries, pinned {EXPECTED_TOTAL}"
    )
    assert len(oracles) == EXPECTED_ORACLE_BACKED


def test_window_subset_of_registry_and_oracle_backed():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in PRIORITY_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"
    unbacked = [n for n in PRIORITY_WINDOW if n not in oracles]
    assert not unbacked, (
        f"window names without oracles (would burn a driver slot on "
        f"err: no_oracle): {unbacked}"
    )


def test_window_fills_driver_sample_exactly():
    assert len(PRIORITY_WINDOW) == DRIVER_SAMPLE
    assert len(set(PRIORITY_WINDOW)) == DRIVER_SAMPLE, "duplicate window names"
    first = list(entrymod.queries())[:DRIVER_SAMPLE]
    assert first == list(PRIORITY_WINDOW), (
        "queries() must yield the window first, in window order"
    )


def test_rows_only_entries_ordered_last():
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    rows_only_idx = [i for i, n in enumerate(qs) if n not in oracles]
    n_backed = len(qs) - len(rows_only_idx)
    assert rows_only_idx == list(range(n_backed, len(qs))), (
        "rows-only queries must sort to the end of queries() so the "
        "driver's 50-sample never lands on an err: no_oracle row"
    )


def test_every_oracle_belongs_to_a_registered_query():
    qs = entrymod.queries()
    orphans = [n for n in entrymod.oracle_sql() if n not in qs]
    assert not orphans, f"oracles without queries: {orphans}"
