#!/usr/bin/env python3
"""Engine-to-engine control: time DuckDB executing the repo's own
oracle SQL (the exact statements the correctness gate runs) over an
SF dir's parquet tables. Driver-side tooling only.

Usage: python3 tools/duck_control.py <sfDir> <oracle_sql.json> [threads]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1]
    oracles = json.load(open(sys.argv[2]))
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"SET threads = {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    times, failed = {}, {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            failed[name] = str(e)[:120]
    total = round(sum(times.values()), 1)
    print(json.dumps({"engine": "duckdb", "version": duckdb.__version__,
                      "threads": threads, "sf": sf, "n": len(times),
                      "total_sec": total, "failed": failed,
                      "slowest": dict(sorted(times.items(),
                                             key=lambda x: -x[1])[:12])}))

if __name__ == "__main__":
    main()
