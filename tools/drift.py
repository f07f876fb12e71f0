#!/usr/bin/env python3
"""Drift adjudication in ONE artifact (driver-side tooling only).

Round 17 cost two sessions of forensics when a VM reboot moved every
number by ~1.25x: 58 per-query diffs had to be walked by hand to rule
out a real regression. The signal that settled it — the same-host
DuckDB control drifted by the SAME factor — can be computed up front:
this script times DuckDB 1.0.0 executing the repo's own oracle SQL
(the exact statements the correctness gate runs) on the same parquet,
then AUGMENTS bench_full.json with:

  control_total    total control seconds (n statements)
  control_queries  per-query control seconds
  ratio_queries    spark warm (min-of-5) / control, per query
  family_ratio     median ratio per query-family prefix (d_, e_, t_,
                   pipe_, ...) — the drift detector: a host move
                   shifts every family by the same factor; a real
                   regression moves one family (or one query) alone
  control_engine / control_version / control_threads

Usage:
  python3 tools/drift.py <sfDir> <bench_full.json> <oracle_sql.json> [threads]
"""
import json
import os
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf, bench_path, oracle_path = sys.argv[1:4]
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    bench = json.load(open(bench_path))
    oracles = json.load(open(oracle_path))
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
            times[name] = round(time.time() - t0, 4)
        except Exception as e:
            failed[name] = str(e)[:120]

    warm = bench.get("warm_queries", {})
    ratios = {q: round(warm[q] / t, 3)
              for q, t in times.items() if q in warm and t > 0}
    fams = {}
    for q, r in ratios.items():
        # family = the leading alphabetic run of the first name token
        # (a1_/a9_ -> a, n16_ -> n, pipe_ -> pipe, w7b_ -> w) — wide
        # enough that a family median is a robust drift statistic
        head = q.split("_", 1)[0]
        fam = "".join(c for c in head if c.isalpha()) or head
        fams.setdefault(fam, []).append(r)
    family_ratio = {f: round(statistics.median(rs), 3)
                    for f, rs in sorted(fams.items())}
    control = {
        "control_total": round(sum(times.values()), 1),
        "control_queries": times,
        "control_failed": failed,
        "control_engine": "duckdb",
        "control_version": duckdb.__version__,
        "control_threads": threads,
        "control_sf": sf,
    }
    bench.update(control)
    bench.update({"ratio_queries": ratios, "family_ratio": family_ratio})
    with open(bench_path, "w") as f:
        json.dump(bench, f)
    # SIDECAR (r19): the control measurement survives bench re-runs —
    # graft.Bench reads drift_control.json at write time, merges the
    # control_* fields into bench_full.json and recomputes the ratio
    # fields against ITS OWN warm times, so a post-drift bench run
    # refreshes (never clobbers) the adjudication artifact.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(bench_path)),
                           "drift_control.json")
    with open(sidecar, "w") as f:
        json.dump(control, f)
    print(json.dumps({
        "metric": "drift",
        "spark_warm_total": round(sum(v for v in warm.values() if v >= 0), 1),
        "control_total": bench["control_total"],
        "n_ratio": len(ratios),
        "family_ratio": family_ratio,
        "control_failed": len(failed),
    }))


if __name__ == "__main__":
    main()
