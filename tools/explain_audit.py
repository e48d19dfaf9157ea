"""Plan-quality audit: dump every registered query's physical plan and
flag scale anti-patterns.

Checks per plan:
- CartesianProduct / BroadcastNestedLoopJoin → quadratic or
  broadcast-explosion risk (flag; some are intentional and listed in
  ALLOWED below with justification),
- BatchEvalPython → row-at-a-time Python UDF in the hot path (always a
  bug; Arrow variants ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  are the sanctioned slow path),
- counts Exchange (shuffle) operators — the scale currency,
- parquet scans with an empty ReadSchema prune or no PushedFilters when
  a filter exists are reported for eyeballing.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# intentional nested-loop/cartesian plans, with why they're fine at scale
ALLOWED_NESTED_LOOP = {
    # driver-bounded query set broadcast against banded candidates;
    # the corpus side never replicates
    "sim_topk_lsh",
    # one-row broadcast (global-total scalar) joined by a range
    # predicate — the standard scalar-subquery plan, O(n) not O(n²)
    "q11_important_stock",
    # one-row broadcast (corpus doc count) cross-joined onto the
    # sampled tf rows — scalar fan-out, O(n)
    "tfidf_top_terms",
}

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    import __spark_entry__ as entrymod
    from gibbon_spark.session import get_spark

    spark = get_spark("explain_audit")
    qs = entrymod.queries()
    only = set(sys.argv[1:])
    problems = []
    print(f"{'query':34} {'shuffles':>8} {'flags'}")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = len(re.findall(r"Exchange ", plan))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_NESTED_LOOP:
            flags.append("NESTED_LOOP")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PYTHON_UDF")
        marker = " ".join(flags) if flags else "ok"
        print(f"{name:34} {shuffles:>8} {marker}")
        if flags:
            problems.append((name, flags))
    if problems:
        print("\nFLAGGED:")
        for name, flags in problems:
            print(f"  {name}: {flags}")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
