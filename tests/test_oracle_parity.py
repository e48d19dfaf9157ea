"""Every registered query must match its DuckDB oracle at sf0.001 —
the same comparison the driver's t2 gate runs at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE


def _pairs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, name in oracles) for name in qs]


@pytest.mark.parametrize("name,has_oracle", _pairs(), ids=[n for n, _ in _pairs()])
def test_query_matches_oracle(spark, duck, name, has_oracle):
    from oracle_check import compare

    fn = entrymod.queries()[name]
    spark_pdf = fn(spark, SF_ORACLE).toPandas()
    if not has_oracle:
        # rows-only check (mirrors the driver's weaker gate)
        assert spark_pdf is not None
        return
    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "n_samples" in df.columns
