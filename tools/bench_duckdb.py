#!/usr/bin/env python3
"""Same-machine DuckDB hot-run over the heavy-bench parquet, for a direct
throughput comparison against graft.Bench's `heavy` section (BASELINE.md's
9.3 s ClickBench number was measured on different hardware — this gives an
apples-to-apples ratio on identical data, threads, and page cache).

Usage: python tools/bench_duckdb.py [heavy_dir] [threads]
  heavy_dir defaults to the newest /tmp/graft_heavy_* (created by
  `runMain graft.Bench`).
"""
import glob
import json
import os
import sys
import time

import duckdb

QUERIES = {
    "h01_filter_agg":
        "SELECT count(*), sum(l_extendedprice), avg(l_discount) "
        "FROM li WHERE l_quantity > 25",
    "h02_group_lowcard":
        "SELECT l_returnflag, l_linestatus, sum(l_quantity), "
        "sum(l_extendedprice), avg(l_discount), count(*) FROM li GROUP BY 1,2",
    "h03_group_highcard_topk":
        "SELECT l_partkey, count(*) n, sum(l_extendedprice) rev "
        "FROM li GROUP BY 1 ORDER BY rev DESC LIMIT 10",
    "h04_count_distinct":
        "SELECT l_returnflag, count(DISTINCT l_orderkey) FROM li GROUP BY 1",
    "h05_arith_revenue":
        "SELECT sum(l_extendedprice * (1.0 - l_discount)) FROM li "
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01'",
    "h06_having_topk":
        "SELECT l_suppkey, count(*) n, sum(l_quantity) q FROM li "
        "GROUP BY 1 HAVING count(*) > 100 ORDER BY q DESC LIMIT 10",
    "h07_events_hourly":
        "SELECT date_trunc('hour', ts) h, event_type, count(*) n, avg(value) "
        "FROM ev GROUP BY 1,2 ORDER BY n DESC LIMIT 10",
    "h08_events_like":
        "SELECT event_type, count(*), avg(value) FROM ev "
        "WHERE props LIKE '%a%' GROUP BY 1",
    "h09_join_agg":
        "SELECT o_orderpriority, count(*) n, "
        "sum(l_extendedprice * (1.0 - l_discount)) rev "
        "FROM li JOIN o ON l_orderkey = o_orderkey "
        "GROUP BY 1 ORDER BY rev DESC",
}


def main():
    # newest COMPLETE heavy dir by mtime — probe runs leave partial dirs
    # (e.g. lineitem+events only), and an alphabetical pick once paired
    # the official Spark numbers against a 120k-row stale dir
    dirs = [d for d in glob.glob("/tmp/graft_heavy_*")
            if all(os.path.isdir(os.path.join(d, t))
                   for t in ("lineitem", "events", "orders"))]
    dirs.sort(key=os.path.getmtime)
    heavy = sys.argv[1] if len(sys.argv) > 1 else (dirs and dirs[-1])
    if not heavy:
        sys.exit("no complete /tmp/graft_heavy_* dir; "
                 "run `runMain graft.Bench` first")
    print(f"heavy_dir: {heavy}")
    threads = sys.argv[2] if len(sys.argv) > 2 else "32"
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    con.execute(f"CREATE VIEW li AS SELECT * FROM "
                f"read_parquet('{heavy}/lineitem/*.parquet')")
    con.execute(f"CREATE VIEW ev AS SELECT * FROM "
                f"read_parquet('{heavy}/events/*.parquet')")
    con.execute(f"CREATE VIEW o AS SELECT * FROM "
                f"read_parquet('{heavy}/orders/*.parquet')")
    li_rows = con.sql("SELECT count(*) FROM li").fetchone()[0]
    ev_rows = con.sql("SELECT count(*) FROM ev").fetchone()[0]
    o_rows = con.sql("SELECT count(*) FROM o").fetchone()[0]
    total = 0.0
    out = {}
    for name, sql in QUERIES.items():
        con.execute(sql).fetchall()          # warm
        # min of 3: same contamination armor as graft.Bench's heavy phase
        dt = min(timed_run(con, sql) for _ in range(3))
        total += dt
        if name.startswith("h07") or name.startswith("h08"):
            rows = ev_rows
        elif name.startswith("h09"):
            rows = li_rows + o_rows
        else:
            rows = li_rows
        out[name] = dt
        print(f"{name}: {dt:.3f}s  {rows / dt / 1e6:.1f} Mrows/s")
    print(f"duckdb_total: {total:.2f}s  (threads={threads}, "
          f"lineitem={li_rows}, events={ev_rows})")
    with open("bench_duckdb.json", "w") as f:
        json.dump({"queries": out, "total": total, "threads": threads,
                   "reps": 3, "lineitem_rows": li_rows,
                   "events_rows": ev_rows,
                   "loadavg": list(os.getloadavg())}, f, indent=1)


def timed_run(con, sql):
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0


if __name__ == "__main__":
    main()
