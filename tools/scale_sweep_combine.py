#!/usr/bin/env python3
"""Combine three Bench heavy artifacts (repl 100/200/400) into one
scale-sweep record: per-query seconds vs scanned rows, per-doubling time
ratios, and a linearity verdict per query.

Verdict rule: with perfectly linear scaling both doublings show ratio
~2.0. We call a query "superlinear" only when BOTH doublings exceed 2.6x
(a one-off >2.6 is noise or a cache edge; sustained growth is the
bottleneck signal). Sublinear ratios (<2) are fine - fixed per-job
overhead amortizing away as the scan grows."""
import json, sys

arts = [json.load(open(p)) for p in sys.argv[1:4]]
repls = [100, 200, 400]
queries = sorted(arts[0]["heavy"].keys())
out = {
    "what": "heavy set at SPARK_GRAFT_HEAVY_REPL 100/200/400, cpus=32, "
            "min of 3 sweeps after warm pass, same harness as BENCH_rN",
    "finding": "the sweep's first run (8g heap, fixed 32 shuffle "
            "partitions) killed h09 at repl=400: AQE coalesces shuffle "
            "partitions to the 64MB advisory, so each shuffled-hash-join "
            "build is ~200-300MB in memory at ANY scale, and 32 "
            "concurrent unspillable builds exceeded the 8g pool ('Can't "
            "acquire ... bytes to build hash relation'). Fixes: shuffle "
            "partitions now scale with input (constant shuffle bytes per "
            "partition) and the JVM is provisioned for concurrency x "
            "bounded-build-size (24g default; DuckDB on the same box runs "
            "uncapped). Per-task memory is scale-INVARIANT under this "
            "sizing - the cluster analogue is executors-per-byte, not "
            "memory-per-executor, growing with data.",
    "lineitem_rows": [a["heavy_lineitem_rows"] for a in arts],
    "events_rows": [a["heavy_events_rows"] for a in arts],
    "contended": [a.get("contended", False) for a in arts],
    "loadavg_start": [a.get("loadavg_start") for a in arts],
    "queries": {},
}
worst = []
for q in queries:
    secs = [a["heavy"][q] for a in arts]
    if any(not isinstance(s, (int, float)) for s in secs):
        out["queries"][q] = {"secs": secs, "verdict": "error"}
        continue
    r1 = secs[1] / secs[0]
    r2 = secs[2] / secs[1]
    verdict = "superlinear" if (r1 > 2.6 and r2 > 2.6) else \
              "linear" if max(r1, r2) <= 2.6 else "noisy-one-doubling"
    out["queries"][q] = {
        "secs": [round(s, 3) for s in secs],
        "ratio_100_to_200": round(r1, 2),
        "ratio_200_to_400": round(r2, 2),
        "verdict": verdict,
    }
    worst.append((max(r1, r2), q))
# h09b advantage should WIDEN with scale: the exchange it removes grows
# with the fact side while the co-located join grows only in scan.
try:
    adv = [a["heavy"]["h09_join_agg"] / a["heavy"]["h09b_join_agg_bucketed"]
           for a in arts]
    out["h09_over_h09b_advantage"] = [round(x, 2) for x in adv]
    out["h09b_advantage_widens"] = adv[2] > adv[0]
except Exception:
    pass
out["totals_sec"] = [round(a["heavy_total"], 2) for a in arts]
out["superlinear_queries"] = [
    q for q, v in out["queries"].items() if v.get("verdict") == "superlinear"]
print(json.dumps(out, indent=1))
