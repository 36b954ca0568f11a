#!/usr/bin/env python3
"""Combine N heavy-only Bench artifacts into a committed Spark floors
file: per-query floor = smallest sample (pooled across every sweep of
every run) that a second pooled sample confirms within 20%. Mirrors
tools/record_duckdb_floors.py. Scale-indexed (round-13 directive #2):
--repl 100 (default) writes probes/spark_floors.json, any other repl
writes probes/spark_floors_repl<N>.json.
Usage: combine_spark_floors.py [--repl N] a.json ..."""
import json
import sys

args = sys.argv[1:]
repl = 100
if args and args[0] == "--repl":
    repl = int(args[1])
    args = args[2:]

pool = {}
meta = []
for p in args:
    d = json.load(open(p))
    for q, s in d.get("heavy_samples", {}).items():
        pool.setdefault(q, []).extend(s)
    meta.append({
        "file": p,
        "contended": d.get("contended"),
        "ext_during": d.get("heavy_sweep_ext_during"),
    })
floors = {}
notes = {}
for q, s in pool.items():
    st = sorted(s)
    floor = st[-1]
    for i in range(len(st) - 1):
        if st[i + 1] <= 1.2 * st[i]:
            floor = st[i]
            break
    floors[q] = floor
    if floor != st[0]:
        notes[q] = (f"global min {st[0]:.3f} unconfirmed "
                    f"(next {st[1]:.3f}); committed {floor:.3f}")
out_path = ("probes/spark_floors.json" if repl == 100
            else f"probes/spark_floors_repl{repl}.json")
out = {
    "what": (f"Spark QUIET per-query heavy floors at repl={repl}, "
             "local[32], REPRODUCTION required: pooled samples across "
             "fresh-JVM heavy-only Bench runs, floor = smallest sample "
             "confirmed by a second within 20% — the same discipline as "
             "the DuckDB floors file. Bench's floor/chase checks pick "
             "the floors file matching the run's repl (round-13 "
             "directive #2)."),
    "repl": repl,
    "queries": floors,
    "samples": {q: sorted(s) for q, s in pool.items()},
    "unconfirmed_minima": notes,
    "runs": meta,
    "total_h01_h09": sum(v for q, v in floors.items()
                         if not q.startswith("h09b")),
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"out": out_path, "floors": floors, "notes": notes},
                 indent=1))
