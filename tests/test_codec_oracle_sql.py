"""Pins the DuckDB SQL replay of the Gorilla encoders
(gibbon_spark/codec/oracle_sql.py) against the scalar Python encoders on
ADVERSARIAL synthetic streams — Spark-free, so it runs in milliseconds
and survives DuckDB upgrades (the packed-BIGINT fold exists precisely
because DuckDB 1.0 miscompiles struct-accumulator list_reduce in
grouped queries; if a future DuckDB changes lambda semantics, this is
the test that notices).

Adversarial shapes the driver data never exercises:
- exact repeats (xor == 0 → the 1-bit path, window kept/reset per policy)
- sign flips (xor leading zeros = 0)
- exponent jumps (lz > 31 → the 5-bit cap path, capped vs uncapped lz
  diverge between the record's own cost and its role as window source)
- trailing-zero-rich mantissas (reuse-vs-new-window boundary decisions)
- sub-second epoch ties (the round-8 determinism fix: (epoch, value)
  order) and dod rung boundaries (±63/64, ±255/256, ±2047/2048)
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest

from gibbon_spark.codec.gorilla import (
    BitWriter,
    DoubleEncoder,
    DoubleEncoderLeadTrail,
    TimestampEncoder,
)
from gibbon_spark.codec.oracle_sql import GORILLA_RATIO_ORACLE, xor_fold_sql


def _scalar_bits(values: list[float], cls) -> int:
    w = BitWriter()
    enc = cls()
    for v in values:
        enc.push(v, w)
    return w.getvalue()[1]


def _adversarial_series() -> dict[str, list[float]]:
    base = 1234.5678
    series: dict[str, list[float]] = {}
    series["repeats"] = [7.25] * 20
    series["sign_flips"] = [base * ((-1) ** i) for i in range(40)]
    series["exponent_jumps"] = [
        base * (10.0 ** ((i * 37) % 60 - 30)) for i in range(40)
    ]
    # trailing-zero-rich: values whose bit patterns end in many zeros
    series["tz_rich"] = [
        struct.unpack("<d", struct.pack("<Q", (0x3FF0 + i) << 48))[0]
        for i in range(40)
    ]
    # mixed: repeats interleaved with tiny and huge deltas
    mixed = []
    for i in range(30):
        mixed += [base, base, base + 2.0**-40 * i, -base * (1 + i)]
    series["mixed"] = mixed
    # near-boundary magnitudes around powers of two (the exact-lz fix)
    series["pow2_edges"] = [
        float(2**52 - 1), float(2**52), float(2**52 + 1), 1.0,
        float(2**31 - 1), -float(2**31), 0.0, -0.0, math.pi,
    ] * 4
    return series


def test_fold_sql_matches_scalar_encoders_on_adversarial_series():
    series = _adversarial_series()
    con = duckdb.connect()
    rows = []
    for name, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((name, i, v))
    con.execute("CREATE TABLE stream (k VARCHAR, o1 BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO stream VALUES (?, ?, ?)", rows)
    sql = (
        "WITH src AS (SELECT k AS sk, o1, v FROM stream), "
        + xor_fold_sql("src", "sk", "o1")
        + "SELECT k, n_values, xor_bits, leadtrail_bits FROM ser"
    )
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    for name, vals in series.items():
        # first value is stored raw (64 bits) by both policies; the
        # scalar encoders are the source of truth
        exp_xor = _scalar_bits(vals, DoubleEncoder)
        exp_lt = _scalar_bits(vals, DoubleEncoderLeadTrail)
        n, gx, gl = got[name]
        assert n == len(vals), name
        assert gx == exp_xor, f"{name}: xor fold {gx} != scalar {exp_xor}"
        assert gl == exp_lt, f"{name}: leadtrail fold {gl} != scalar {exp_lt}"


def test_gorilla_ratio_oracle_matches_scalar_block_encode():
    """End-to-end GORILLA_RATIO_ORACLE vs scalar TimestampEncoder +
    DoubleEncoder on a synthetic events table hitting every dod rung
    boundary and the sub-second epoch-tie case."""
    import pandas as pd

    points: list[tuple[int, float, float]] = []  # (user, epoch_float, value)
    # user 1: dod rung boundaries — deltas engineered so successive
    # delta-of-deltas land on ±63/64/±255/256/±2047/2048/±40000
    deltas = [10, 10, 74, 10, 266, 10, 2058, 10, 40010, 10, 11, 9]
    t = 0
    for i, d in enumerate(deltas):
        t += d
        points.append((1, float(t), 100.0 + i))
    # user 2: sub-second ties — two points in the same second, values
    # inserted in DESCENDING order (the oracle must re-sort by value)
    for i in range(6):
        sec = 7200 + 60 * i
        points.append((2, sec + 0.9, 50.0 - i))
        points.append((2, sec + 0.1, 50.0 + i))
    # user 3: crosses a 2h bucket boundary mid-series -> two blocks
    for i in range(8):
        points.append((3, 7200 * 2 - 240 + 60 * i, 7.5 * (i % 3)))

    pdf = pd.DataFrame(
        {
            "user_id": [p[0] for p in points],
            "ts": pd.to_datetime([p[1] for p in points], unit="s"),
            "value": [p[2] for p in points],
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(GORILLA_RATIO_ORACLE).fetchdf().iloc[0]

    # expected: scalar interleaved encode per (user, 2h bucket) with the
    # engine's total (epoch, value) order
    blocks: dict[tuple[int, int], list[tuple[int, float]]] = {}
    for u, tf, v in points:
        ep = int(tf)  # floor to seconds, as the engine does
        ht = ep - ep % 7200
        blocks.setdefault((u, ht), []).append((ep, v))
    total_bytes = 0
    nrows = 0
    for (u, ht), pts in blocks.items():
        pts.sort()  # (epoch, value)
        w = BitWriter()
        te, de = TimestampEncoder(ht), DoubleEncoder()
        for ep, v in pts:
            te.push(ep, w)
            de.push(v, w)
        payload, nbits = w.getvalue()
        assert len(payload) == (nbits + 7) // 8
        total_bytes += len(payload)
        nrows += len(pts)

    assert int(got["rows"]) == nrows
    assert int(got["compressed_bytes"]) == total_bytes, (
        int(got["compressed_bytes"]),
        total_bytes,
    )
    assert int(got["raw_bytes"]) == nrows * 16
    assert got["ratio_pct"] == pytest.approx(
        round(100.0 * total_bytes / (nrows * 16) + 1e-9, 2)
    )
