"""Standalone validation harness for the codec bit-accounting oracles
(gibbon_spark/codec/oracle_sql.py): runs the SHIPPED oracle SQL strings
on DuckDB and the Spark registry queries side by side, printing both.
Used to prove the round-8 rows-only -> hash-exact conversions bit-exact
at sf0.001/sf0.01/sf0.1 before wiring them into the registry (and to
re-validate after any codec or oracle change).

Run: python tools/proto_codec_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gibbon_spark.codec.oracle_sql import (  # noqa: E402
    CODEC_XOROR_BITS_ORACLE,
    GORILLA_RATIO_ORACLE,
    xor_fold_sql,
)

# re-exported for the debugging snippets in the round-8 work log
xor_elements_sql = xor_fold_sql


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    duck_x = con.execute(CODEC_XOROR_BITS_ORACLE).fetchdf()
    duck_g = con.execute(GORILLA_RATIO_ORACLE).fetchdf()
    print("duck codec_xoror:\n", duck_x.to_string())
    print("duck gorilla_ratio:\n", duck_g.to_string())

    import __spark_entry__ as entrymod
    from gibbon_spark.session import get_spark

    spark = get_spark("proto_codec_oracle")
    qs = entrymod.queries()
    spark_x = qs["codec_xoror_bits"](spark, sf_dir).toPandas()
    spark_g = qs["gorilla_compression_ratio"](spark, sf_dir).toPandas()
    print("spark codec_xoror:\n", spark_x.to_string())
    print("spark gorilla_ratio:\n", spark_g.to_string())
    ok = duck_x.equals(spark_x[duck_x.columns]) and duck_g.equals(
        spark_g[duck_g.columns]
    )
    print("MATCH" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
