"""Matched-load A/B for the shared-subtree materialization (the r9
``abtest_ks_distance`` protocol, made reusable): does a query's
``materialize()`` checkpoint WIN wall-clock at a given scale factor, or
does the eager block write cost more than the exchange reuse it buys?

Each measurement is a FRESH subprocess session (no warm caches leak
between variants) running the query end-to-end into the noop sink; the
two variants (GS_CKPT_MODE=local vs off) are INTERLEAVED A,B,A,B,...
so a host-load epoch hits both arms equally, with n reps per arm. The
per-arm MIN is the decision number (min-of-reps measures the plan; the
median is printed too so a reader can judge noise).

Usage:
    python tools/ab_checkpoint.py <query> [sf_dir] [--reps 3]

Prints one JSON line per query:
    {"query": ..., "sf_dir": ..., "local_s": [...], "off_s": [...],
     "min_local": ..., "min_off": ..., "verdict": "ckpt-wins|off-wins"}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from gibbon_spark.session import get_spark
spark = get_spark("ab_ckpt", shuffle_partitions=32)
qs = entrymod.queries()
# warm JVM + parquet footers + Python worker pool so the measurement is
# the plan, not session startup (bench.py discipline)
qs["ts_summary"](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
def _identity(b):
    yield from b
spark.range(0, 64, 1, 64).mapInPandas(_identity, "id long").write.format(
    "noop").mode("overwrite").save()
t0 = time.time()
qs[{name!r}](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
print("AB_WALL", time.time() - t0)
"""


def measure(name: str, sf_dir: str, mode: str) -> float:
    env = dict(os.environ, GS_CKPT_MODE=mode)
    code = _CHILD.format(repo=REPO, sf_dir=sf_dir, name=name)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_WALL"):
            return float(line.split()[1])
    raise RuntimeError(
        f"{name} [{mode}] produced no measurement (rc={proc.returncode}):\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 1
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    local_s: list[float] = []
    off_s: list[float] = []
    for r in range(reps):
        # interleave: local, off, local, off ... under matched load
        local_s.append(round(measure(name, sf_dir, "local"), 3))
        off_s.append(round(measure(name, sf_dir, "off"), 3))
        print(
            f"# rep {r + 1}/{reps}: local={local_s[-1]}s off={off_s[-1]}s",
            file=sys.stderr,
        )
    min_local, min_off = min(local_s), min(off_s)
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "local_s": local_s,
                "off_s": off_s,
                "min_local": min_local,
                "min_off": min_off,
                "verdict": "ckpt-wins" if min_local <= min_off else "off-wins",
                "ratio_local_over_off": round(min_local / min_off, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
