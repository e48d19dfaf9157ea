"""Dtype-parity sweep: Spark ``toPandas()`` dtypes vs DuckDB oracle dtypes.

The driver's correctness gate hashes values dtype-sensitively, so a
column that is int64 on the Spark side but float64 on the oracle side
(typical cause: DuckDB ``sum(CASE WHEN ... THEN 1 ...)`` returns
HUGEINT, which pandas widens to float64) flips the hash even when every
value is equal. This sweep runs every oracle-backed query at a small SF
and reports any column whose dtype *class* (int vs float vs other)
differs between the two engines.

Usage: python tools/dtype_parity.py [sf_dir] [query ...]
Exit 0 = no mismatches.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.oracle_check import duck_connection  # noqa: E402


def dtype_class(s: pd.Series) -> str:
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gibbon_spark.session import get_spark

    spark = get_spark("dtype_parity")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad: list[str] = []
    n_checked = 0
    for name in qs:
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            con = duck_connection(sf_dir)
            duck_pdf = con.execute(oracles[name]).fetchdf()
            con.close()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: ERROR {e}")
            print(f"ERROR {name}: {e}")
            continue
        n_checked += 1
        mismatches = []
        for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
            sc, dc = dtype_class(spark_pdf[c]), dtype_class(duck_pdf[c])
            # Empty-frame oracles come back all-object from fetchdf();
            # only int-vs-float is hash-relevant (other classes either
            # match by construction or are caught by the value compare).
            if {sc, dc} == {"int", "float"}:
                mismatches.append(
                    f"col {c}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
                )
        if mismatches:
            bad.append(f"{name}: " + "; ".join(mismatches))
            print(f"MISMATCH {name} ({time.time()-t0:.1f}s)")
            for m in mismatches:
                print(f"     {m}")
        else:
            print(f"OK {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_checked} checked, {len(bad)} with mismatches/errors")
    for b in bad:
        print(f"  {b}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
