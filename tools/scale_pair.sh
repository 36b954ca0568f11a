#!/bin/bash
# Round-12 directive #2: the paired quiet bench at repl=400 (240 M
# lineitem rows) — the scale the engine claims to target, where h07/h08's
# fixed per-stage floors amortize and h09's exchange meets real data.
# Spark side runs at the build.sbt default heap for repl>=200 (1.5 g/core
# = 48 g at 32 cpus, the A/B-proven GC-quiet provisioning); DuckDB runs
# uncapped via the same bench_duckdb.py pairing inside ONE Bench
# invocation, so both sides see adjacent machine state. Mins are
# reproduction-checked by Bench's own unconfirmed/chase machinery AND
# (since round 13) against the scale-indexed committed floors
# probes/{spark,duckdb}_floors_repl<N>.json; ratio_floor_to_floor in
# the artifact describes THIS scale.
# Usage: tools/scale_pair.sh [repl=400] [reps=4]
set -euo pipefail
cd "$(dirname "$0")/.."
REPL=${1:-400}
REPS=${2:-4}
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_PACK=0 \
SPARK_GRAFT_DUCKDB=1 \
SPARK_GRAFT_HEAVY_REPL=$REPL \
SPARK_GRAFT_HEAVY_REPS=$REPS \
sbt --error "runMain graft.Bench" || true
python3 - "$REPL" <<'EOF'
import json, sys
repl = sys.argv[1]
d = json.load(open("bench_detail.json"))
d["what"] = (f"Paired quiet bench at repl={repl} (round-12 directive #2): "
             "Spark 1.5g/core heap + DuckDB uncapped in one invocation, "
             "mins reproduction-checked (see heavy_samples/contended). "
             "pair.ratio = raw h01-h09, pair.ratio_bucketed = h09b standing in.")
out = f"probes/scale_pair_repl{repl}.json"
json.dump(d, open(out, "w"), indent=1)
print(json.dumps({k: d.get(k) for k in
  ("contended", "duckdb_contended", "heap_per_core_gb", "pair")}, indent=1))
print("wrote", out)
EOF
