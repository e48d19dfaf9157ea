"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`gibbon_spark.queries` — the registry pairs each
Spark DataFrame plan with its DuckDB oracle SQL (see SURVEY.md §2 for
the operator inventory each entry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gibbon_spark import queries as _registry  # noqa: E402
import gibbon_spark.queries_llm  # noqa: E402,F401  (registers LLM-pipeline queries)
import gibbon_spark.queries_round2  # noqa: E402,F401  (round-2 additions)
import gibbon_spark.queries_round2b  # noqa: E402,F401  (round-2 batch B)
import gibbon_spark.queries_round2c  # noqa: E402,F401  (round-2 batch E)
import gibbon_spark.queries_round2d  # noqa: E402,F401  (round-2 batch F)
import gibbon_spark.queries_round3  # noqa: E402,F401  (round-3 additions)
import gibbon_spark.queries_round4  # noqa: E402,F401  (round-4 additions)
import gibbon_spark.queries_round5  # noqa: E402,F401  (round-5 additions)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's five scan-aggregates in one pass
    (csv_to_packed.rs:36-76) over sf0.001 events."""
    return _registry.queries()["ts_summary"](spark, "/root/testdata/sf0.001")


# Driver-window rotation lives in gibbon_spark.queries.priority_window()
# (the registry front-loads it; the driver samples the first 50 names).
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
