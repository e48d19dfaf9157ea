"""Spark-free checks for the scale-gate tooling: the data generator
must be deterministic and schema-faithful, and the plan-lint window
parser must classify Window plan lines correctly."""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq

from tools.explain_audit import _toplevel_groups, count_partitionless_windows
from tools.gen_scale_data import gen_all

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _dir_digest(d: str) -> dict[str, str]:
    out = {}
    for t in TABLES:
        with open(os.path.join(d, f"{t}.parquet"), "rb") as f:
            out[t] = hashlib.md5(f.read()).hexdigest()
    return out


def test_generator_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    gen_all(0.002, a)
    gen_all(0.002, b)
    assert _dir_digest(a) == _dir_digest(b)


def test_generator_schema_matches_driver_testdata(tmp_path):
    out = str(tmp_path / "s")
    gen_all(0.002, out)
    for t in TABLES:
        drv = [
            (f.name, str(f.type))
            for f in pq.read_schema(f"/root/testdata/sf0.01/{t}.parquet")
        ]
        gen = [(f.name, str(f.type)) for f in pq.read_schema(f"{out}/{t}.parquet")]
        assert drv == gen, t


def test_window_line_classification():
    partitionless = (
        "+- Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS r#2], [id#0L ASC NULLS FIRST]"
    )
    partitioned = (
        "+- Window [row_number() windowspecdefinition(g#1L, id#0L ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS r#4], [g#1L], [id#0L ASC NULLS FIRST]"
    )
    partitioned_unordered = (
        "+- Window [count(1) windowspecdefinition(id#5, specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS n#7], [id#5]"
    )
    assert count_partitionless_windows(partitionless) == 1
    assert count_partitionless_windows(partitioned) == 0
    assert count_partitionless_windows(partitioned_unordered) == 0
    assert count_partitionless_windows("\n".join([partitionless, partitioned])) == 1
    assert _toplevel_groups("[a], [b, [c]], [d]") == ["a", "b, [c]", "d"]
