"""Matched-load A/B for SESSION-CONFIG variants (r12 continuation).

Same discipline as tools/ab_checkpoint.py — each measurement is a fresh
subprocess session, variants are interleaved A,B,A,B so a host-load
epoch hits both arms equally, min-of-reps is the decision number — but
the variant axis is a set of Spark confs (e.g. join strategy prefs)
instead of GS_CKPT_MODE, and one child times MANY queries in one
session so a whole-suite config question costs one bench pass per rep
instead of one session per query.

Usage:
    python tools/ab_conf.py --conf-b spark.sql.join.preferSortMergeJoin=false \
        [--conf-a k=v] [--queries q1,q2,...] [--sf-dir D] [--reps 3]

Prints per-rep JSON lines {"arm": "A"|"B", "rep": n, "total": s,
"queries": {...}} and a final summary comparing min-of-reps per query
and in total.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from gibbon_spark.session import get_spark
conf = json.loads({conf_json!r})
spark = get_spark("ab_conf", extra_conf=conf)
qs = entrymod.queries()
qs["ts_summary"](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
def _identity(b):
    yield from b
spark.range(0, 64, 1, 64).mapInPandas(_identity, "id long").write.format(
    "noop").mode("overwrite").save()
out = {{}}
for name in {names!r}:
    t0 = time.time()
    qs[name](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 4)
print("AB_RESULT " + json.dumps(out))
"""


def measure(names: list[str], sf_dir: str, conf: dict[str, str]) -> dict[str, float]:
    code = _CHILD.format(
        repo=REPO, sf_dir=sf_dir, conf_json=json.dumps(conf), names=names
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"arm produced no measurement (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
    )


def _parse_confs(items: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for it in items:
        k, _, v = it.partition("=")
        if not k or not v:
            raise SystemExit(f"bad conf {it!r}, need key=value")
        out[k] = v
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf-a", action="append", default=[])
    ap.add_argument("--conf-b", action="append", default=[], required=True)
    ap.add_argument("--queries", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.queries:
        names = [q for q in args.queries.split(",") if q]
    else:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entrymod

        names = list(entrymod.queries())
    conf_a = _parse_confs(args.conf_a)
    conf_b = _parse_confs(args.conf_b)

    mins: dict[str, dict[str, float]] = {"A": {}, "B": {}}
    totals: dict[str, list[float]] = {"A": [], "B": []}
    for r in range(args.reps):
        for arm, conf in (("A", conf_a), ("B", conf_b)):
            t = measure(names, args.sf_dir, conf)
            totals[arm].append(round(sum(t.values()), 3))
            for n, v in t.items():
                mins[arm][n] = min(mins[arm].get(n, float("inf")), v)
            print(
                json.dumps({"arm": arm, "rep": r, "total": totals[arm][-1], "queries": t}),
                flush=True,
            )
    min_a, min_b = min(totals["A"]), min(totals["B"])
    per_q = {
        n: {
            "a": mins["A"][n],
            "b": mins["B"][n],
            "ratio_b_over_a": round(mins["B"][n] / mins["A"][n], 3)
            if mins["A"][n]
            else None,
        }
        for n in names
    }
    big_moves = {
        n: v
        for n, v in per_q.items()
        if max(v["a"], v["b"]) > 0.5
        and v["ratio_b_over_a"] is not None  # arm-A min of 0.0s (advisor r12)
        and (v["ratio_b_over_a"] < 1 / 1.15 or v["ratio_b_over_a"] > 1.15)
    }
    print(
        json.dumps(
            {
                "summary": True,
                "totals_a": totals["A"],
                "totals_b": totals["B"],
                "min_total_a": min_a,
                "min_total_b": min_b,
                "verdict": "B-wins" if min_b < min_a else "A-wins",
                "ratio_b_over_a": round(min_b / min_a, 4),
                "big_moves": big_moves,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
