#!/usr/bin/env python3
"""Combine N heavy-only Bench artifacts into probes/spark_floors.json:
per-query floor = smallest sample (pooled across every sweep of every
run) that a second pooled sample confirms within 20%. Mirrors
tools/record_duckdb_floors.py. Usage: combine_spark_floors.py a.json …"""
import json
import sys

pool = {}
meta = []
for p in sys.argv[1:]:
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
out = {
    "what": ("Spark QUIET per-query heavy floors at repl=100, local[32], "
             "recorded round 11 with REPRODUCTION required: pooled "
             "samples across fresh-JVM heavy-only Bench runs, floor = "
             "smallest sample confirmed by a second within 20% — the "
             "same discipline as probes/duckdb_floors.json. Bench's "
             "floor/chase checks prefer this file over "
             "scale_sweep.json's single-leg column."),
    "queries": floors,
    "samples": {q: sorted(s) for q, s in pool.items()},
    "unconfirmed_minima": notes,
    "runs": meta,
    "total_h01_h09": sum(v for q, v in floors.items()
                         if not q.startswith("h09b")),
}
with open("probes/spark_floors.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"floors": floors, "notes": notes}, indent=1))
