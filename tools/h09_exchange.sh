#!/bin/bash
# Round-8 directive #2: A/B h09's exchange path, fresh JVM per mode,
# modes interleaved across sweeps so machine drift spreads evenly.
# Usage: tools/h09_exchange.sh [heavyDir] [sweeps] [repsPerJvm]
# Output: one JSON line per (sweep, mode) appended to /tmp/h09_exchange_raw.jsonl
set -e
DIR=${1:-/tmp/graft_heavy_57378e9c}
SWEEPS=${2:-3}
REPS=${3:-5}
OUT=/tmp/h09_exchange_raw.jsonl
: > $OUT
MODES="base p64 p128 tmpfs buf1m proj combo"
for s in $(seq 1 $SWEEPS); do
  for m in $MODES; do
    echo "== sweep $s mode $m =="
    sbt -batch "runMain graft.tools.H09ExchangeProbe $DIR $m $REPS" 2>/dev/null \
      | grep '"mode"' | sed "s/^/{\"sweep\":$s,/; s/{\"sweep\":$s,{/{\"sweep\":$s,/" >> $OUT
  done
done
cat $OUT
