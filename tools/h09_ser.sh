#!/bin/bash
# Round-11 directive #4: A/B h09's exchange serialization, fresh JVM per
# mode, modes interleaved across sweeps so machine drift spreads evenly.
# Usage: tools/h09_ser.sh [heavyDir] [sweeps] [repsPerJvm]
# Output: one JSON line per (sweep, mode) appended to /tmp/h09_ser_raw.jsonl
set -e
DIR=${1:-/tmp/graft_heavy_57378e9c}
SWEEPS=${2:-3}
REPS=${3:-3}
OUT=/tmp/h09_ser_raw.jsonl
: > $OUT
MODES="base zstd snappy nocomp lzblk512 zstdblk"
for s in $(seq 1 $SWEEPS); do
  for m in $MODES; do
    echo "== sweep $s mode $m =="
    sbt -batch "runMain graft.tools.H09SerProbe $DIR $m $REPS" 2>/dev/null \
      | grep '"mode"' | sed "s/^/{\"sweep\":$s,/; s/{\"sweep\":$s,{/{\"sweep\":$s,/" >> $OUT
  done
done
cat $OUT
