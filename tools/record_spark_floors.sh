#!/bin/bash
# Re-record the committed Spark quiet floors (probes/spark_floors.json)
# with the same discipline as tools/record_duckdb_floors.py: N full
# heavy-only Bench runs (fresh JVM each), floors = per-query smallest
# sample CONFIRMED by a second sample within 20%, pooled across runs.
# Usage: tools/record_spark_floors.sh [runs=3] [reps-per-run=4]
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS=${1:-3}
REPS=${2:-4}
rm -f /tmp/spark_floor_run_*.json
for r in $(seq 1 "$RUNS"); do
  echo "=== spark floor run $r/$RUNS ===" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PACK=0 \
  SPARK_GRAFT_DUCKDB=0 \
  SPARK_GRAFT_HEAVY_REPL=100 \
  SPARK_GRAFT_HEAVY_REPS=$REPS \
  sbt --error "runMain graft.Bench" >/dev/null
  cp bench_detail.json "/tmp/spark_floor_run_${r}.json"
done
python3 tools/combine_spark_floors.py /tmp/spark_floor_run_*.json
cat probes/spark_floors.json
