#!/bin/bash
# Re-record the committed Spark quiet floors with the same discipline as
# tools/record_duckdb_floors.py: N full heavy-only Bench runs (fresh JVM
# each), floors = per-query smallest sample CONFIRMED by a second sample
# within 20%, pooled across runs. Scale-indexed (round-13 directive #2):
# repl=100 writes probes/spark_floors.json; any other repl writes
# probes/spark_floors_repl<N>.json recorded AT that scale (heap follows
# the build.sbt repl-scaled rule, e.g. 96 g at repl=400).
# Usage: tools/record_spark_floors.sh [runs=3] [reps-per-run=4] [repl=100]
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS=${1:-3}
REPS=${2:-4}
REPL=${3:-100}
rm -f /tmp/spark_floor_run_*.json
for r in $(seq 1 "$RUNS"); do
  echo "=== spark floor run $r/$RUNS (repl=$REPL) ===" >&2
  rc=0
  # remove any leftover artifact FIRST: a refused (rc 3) or crashed run
  # must not recycle a previous run's samples into this slot
  # (ADVICE r13 #3 — the old `|| true` + unconditional cp double-counted
  # stale samples in the pooled floors)
  rm -f bench_detail.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PACK=0 \
  SPARK_GRAFT_DUCKDB=0 \
  SPARK_GRAFT_HEAVY_REPL=$REPL \
  SPARK_GRAFT_HEAVY_REPS=$REPS \
  SPARK_GRAFT_GATE_TIMEOUT_SEC=${SPARK_GRAFT_GATE_TIMEOUT_SEC:-600} \
  sbt --error "runMain graft.Bench" >/dev/null || rc=$?
  if [ "$rc" -ne 0 ] || [ ! -f bench_detail.json ]; then
    echo "=== run $r refused/failed (rc=$rc) — skipping its samples ===" >&2
    continue
  fi
  cp bench_detail.json "/tmp/spark_floor_run_${r}.json"
done
python3 tools/combine_spark_floors.py --repl "$REPL" /tmp/spark_floor_run_*.json
