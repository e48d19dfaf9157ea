"""Exact cross-engine money arithmetic in scaled-long space (r12).

The oracle contract rounds every money-like value to 4 dp per row and
sums exactly; the original implementation carried that as
``decimal(24,4)``, which costs a BigDecimal construction per row and a
non-compact decimal sum buffer. These helpers carry the SAME exact
values as 1e-4-scaled BIGINTs in pure codegen arithmetic — measured
~3x faster on aggregate-dominated plans (q1: 2.3 s → 0.7 s at sf0.1).
Full rationale, equivalence argument and verified domain on
``gibbon_spark.queries.money_sum``.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def scaled_long(col):
    """``round(col + 1e-9, 4)`` as an exact 1e-4-scaled BIGINT.

    Same value the decimal form ``round(col + 1e-9, 4).cast(
    "decimal(24,4)")`` carries, but held as its unscaled long, computed
    with pure codegen arithmetic — ``floor(y*10000 + 0.5)`` half-away-
    from-zero via the sign-symmetric branch — instead of a per-row
    BigDecimal construction. ``F.round(double, 4)`` rounds the double's
    SHORTEST DECIMAL representation (BigDecimal.valueOf), while this
    form rounds its exact binary value scaled by 1e4; the two agree
    everywhere except when ``col + 1e-9`` lands within ~1 ulp of a
    0.00005 boundary, which the +1e-9 nudge (6 orders of magnitude
    above ulp at money magnitudes) keeps off the table. Verified
    row-for-row equal to the decimal form over every money expression
    of the r12 gate data (lineitem qty/price/disc/tax products incl.
    negated, sf0.001-sf1: 0 mismatches) and end-to-end by the full
    oracle gate; the decimal form stays the semantics reference.
    Domain: |col| < 2^53/1e4 ≈ 9e11 per row (money data tops out ~1e7)
    and NaN/Inf-free inputs, both true of every gate table by
    construction."""
    y = col + F.lit(1e-9)
    return (
        F.when(y >= 0, F.floor(y * 10000 + F.lit(0.5)))
        .otherwise(-F.floor(-y * 10000 + F.lit(0.5)))
        .cast("long")
    )


def round_scaled_long(s, sc: int):
    """Half-away-from-zero rounding of a 1e-4-scaled long sum ``s`` to a
    coarser power-of-ten scale ``sc`` — in INTEGER arithmetic (SQL
    ``div``, truncating; both branches operate on non-negative values so
    truncation equals floor), because a double ``floor((s + h)/sc)``
    would drift once |s| passes 2^53 (reached by sf100-scale money
    sums). Exactly BigDecimal HALF_UP on the same exact value."""
    h, d = F.lit(sc // 2), F.lit(sc)
    return F.when(s >= 0, F.call_function("div", s + h, d)).otherwise(
        -F.call_function("div", -s + h, d)
    )


# split radix for the two-level exact money sum below
_SPLIT_M = 1 << 20


def money_exact_sum(col):
    """Exact 1e-4-scaled money sum at 100 TB magnitudes (r13, closing
    the r12 int64 ceiling) — returned as ``decimal(38,0)``.

    The r12 single-long accumulator was exact only through
    |Σ v_scaled| < 2^63 ≈ sf1500 for the largest TPC-H money sums — two
    orders below the 100 TB ≈ sf100000 target, where per-group scaled
    sums reach ~4·10^19; past the ceiling ANSI mode raises
    ARITHMETIC_OVERFLOW and the query DIES (with ANSI off it would wrap
    silently). Fix: split each per-row scaled long ``v`` (still
    :func:`scaled_long`'s pure codegen arithmetic) into
    ``hi = v div 2^20`` and ``lo = v % 2^20`` (truncating div/rem pair,
    so ``hi·2^20 + lo == v`` for negatives too), sum the two LONG
    columns with plain primitive codegen buffers, and recombine
    ``Σhi·2^20 + Σlo`` in ``decimal(38,0)`` once per group AFTER
    aggregation. The per-row div/rem fold into the same codegen stage
    (subexpression elimination shares the one scaled_long): measured
    1.04× the r12 path on q1 at sf0.1, where a decimal(38,0) sum
    buffer costs 2.03×.

    Exactness domain: |Σv| < 2^63·2^20 ≈ 9.7e24 (≈ sf2.4e10) and
    rows-per-group < 2^63/2^20 ≈ 8.8e12 (≈ sf1.5e6 on lineitem's
    biggest group) — three orders past the target on both axes, and a
    breach still raises loudly under ANSI instead of corrupting the
    sum. Verified exact against Python big-int and the DuckDB
    decimal(38,4) oracle form at simulated sf100000 magnitudes, and
    bit-identical to the r12 path at every gate SF."""
    v = scaled_long(col)
    m = F.lit(_SPLIT_M)
    hi = F.sum(F.call_function("div", v, m))
    lo = F.sum(v % m)
    return hi.cast("decimal(38,0)") * m + lo
