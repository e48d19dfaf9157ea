#!/bin/bash
# Run the six feasible sf3 oracles, ONE query per process (round-4 sf3
# protocol: each gets a fresh 48g-capable JVM and its own capped DuckDB;
# GS_ORACLE_DUCK_MEM=40GB leaves room for the Spark side). Appends the
# six PASS/FAIL lines plus a summary to SCALE_ORACLE_SF3.txt.
set -u
cd "$(dirname "$0")/.."
SF3=${1:-scaledata/sf3}
OUT=${2:-/tmp/sf3_oracles_r7.log}
export GS_ORACLE_DUCK_MEM=40GB
: > "$OUT"
for q in dedup_containment sim_embedding_neardup sim_embedding_neardup_exact \
         knn_graph_lsh dedup_clusters_cc graph_triangle_count; do
  echo "=== $q ===" >> "$OUT"
  python tools/sf3_feasible_oracles.py "$SF3" "$q" >> "$OUT" 2>&1
  echo "rc=$? for $q" >> "$OUT"
done
echo "ALL DONE" >> "$OUT"
