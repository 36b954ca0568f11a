#!/usr/bin/env python3
"""Re-record the committed DuckDB quiet floors (probes/duckdb_floors.json)
with REPRODUCTION required — the same discipline the Spark side's
confirmed-minima check uses.

Round-11 motivation: the r10 floors were min-of-3 from a single run;
h06's 0.050 s has never reproduced since (every quiet re-measure lands
0.08-0.09 s, 1.6-1.8x the floor), so the Bench chase loop burns its
retry budget on every run chasing a one-off. A floor that cannot be
reproduced is not a floor.

Protocol: N invocations of tools/bench_duckdb.py (fresh process each,
hot page cache), gated on 1-min loadavg < 2.0 between invocations. The
recorded floor per query is the smallest value CONFIRMED by a second
sample within 20%; an unconfirmed global min is reported but not
committed.

Usage: python3 tools/record_duckdb_floors.py <heavy_dir> [runs=5] [repl=100]
Writes probes/duckdb_floors.json (repl=100) or
probes/duckdb_floors_repl<N>.json — scale-indexed floors, round-13
directive #2.
"""
import json
import os
import subprocess
import sys
import time

def loadavg1():
    return float(open("/proc/loadavg").read().split()[0])

def main():
    heavy = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    threads = os.environ.get("THREADS", "32")
    samples = {}
    loads = []
    for r in range(runs):
        waited = 0
        while loadavg1() >= 2.0 and waited < 600:
            time.sleep(15); waited += 15
        loads.append(loadavg1())
        subprocess.run(["python3", "tools/bench_duckdb.py", heavy, threads],
                       check=True, capture_output=True)
        q = json.load(open("bench_duckdb.json"))["queries"]
        for k, v in q.items():
            samples.setdefault(k, []).append(v)
        print(f"run {r+1}/{runs}: " +
              " ".join(f"{k.split('_')[0]}={v:.3f}" for k, v in q.items()),
              file=sys.stderr)
    floors = {}
    notes = {}
    for k, s in samples.items():
        st = sorted(s)
        # smallest value whose successor sample is within 20%
        floor = st[-1]
        for i in range(len(st) - 1):
            if st[i + 1] <= 1.2 * st[i]:
                floor = st[i]
                break
        floors[k] = floor
        if floor != st[0]:
            notes[k] = (f"global min {st[0]:.3f} unconfirmed "
                        f"(next sample {st[1]:.3f}); committed the "
                        f"reproduced {floor:.3f}")
    out = {
        "what": (f"DuckDB QUIET per-query floors at repl={repl}, threads=" +
                 threads + ", re-recorded round 11 with REPRODUCTION "
                 "required: each floor is the smallest of " + str(runs) +
                 " fresh-process min-of-3 values that a second sample "
                 "confirms within 20% (an unreproducible one-off is not "
                 "a floor — the r10 h06 0.050 never reproduced and made "
                 "the bench chase loop spin)."),
        "queries": floors,
        "samples": samples,
        "unconfirmed_minima": notes,
        "total": sum(floors.values()),
        "threads": threads,
        "loadavg_per_run": loads,
    }
    out_path = ("probes/duckdb_floors.json" if repl == 100
                else f"probes/duckdb_floors_repl{repl}.json")
    out["repl"] = repl
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"floors": floors, "notes": notes}, indent=1))

if __name__ == "__main__":
    main()
