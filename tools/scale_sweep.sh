#!/bin/bash
# Scale-proof sweep for the heavy bench set (round-7 directive #3).
#
# Runs the UNCHANGED Bench harness at SPARK_GRAFT_HEAVY_REPL 100/200/400
# (60M/120M/240M lineitem rows) and combines the three bench_detail.json
# artifacts into probes/scale_sweep.json: per-query seconds vs rows plus
# the per-doubling time ratios. A query scaling linearly shows ratios
# ~2.0; superlinear growth (ratio >> 2 on both doublings) flags a hidden
# driver-side or skew bottleneck the 60M bench can't see.
#
# DuckDB pairing and the gate-query pack are disabled: the sweep measures
# Spark's own scaling shape, not the cross-engine ratio (BENCH_rN carries
# that, self-paired, at repl=100).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=probes
mkdir -p "$OUT"
for repl in 100 200 400; do
  echo "=== scale sweep repl=$repl ===" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PACK=0 \
  SPARK_GRAFT_DUCKDB=0 \
  SPARK_GRAFT_HEAVY_REPL=$repl \
  SPARK_GRAFT_HEAVY_REPS=3 \
  sbt --error "runMain graft.Bench" >/dev/null
  cp bench_detail.json "$OUT/sweep_repl${repl}.json"
done
python3 tools/scale_sweep_combine.py \
  "$OUT/sweep_repl100.json" "$OUT/sweep_repl200.json" \
  "$OUT/sweep_repl400.json" > "$OUT/scale_sweep.json"
cat "$OUT/scale_sweep.json"
