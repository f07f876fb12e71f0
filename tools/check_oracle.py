#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]

Runs `sbt runMain graft.Verify <sfDir> <outDir>` output (expects it was
already produced), then for each query: loads <outDir>/<name> parquet,
runs the oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name and rows by all columns, and compares
cell-by-cell. Reports PASS/FAIL per query with a diff sample.

Driver-side tooling only — the shipped library never imports this.
"""
import json
import os
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 vs 0.0
        return v + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
    con = duckdb.connect()
    for t in TABLES:
        # partial dirs (e.g. the ScaleGen 10x corpus has only
        # documents/embeddings) still work for queries confined to the
        # present tables; a query touching a missing one fails loudly
        # at execution, never silently. Spark-written tables are
        # DIRECTORIES of part files — glob those.
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # comma-separated query names whose ORACLE side is infeasible at the
    # chosen data size (e.g. the recursive transitive closure behind
    # d_dup_clusters balloons past 50 GB in DuckDB at 4.4M pairs) —
    # skipping here skips the COMPARISON, not the Spark execution
    skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name} (ORACLE_SKIP)")
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            scols, srows = spark_rel.columns, spark_rel.fetchall()
            duck_rel = con.sql(oracle[name])
            dcols, drows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        # DRIVER-FAITHFUL gate: the driver canonicalizes with
        # pandas.DataFrame.sort_values over ALL columns, which raises
        # "unhashable type: numpy.ndarray" on array/map/struct cells.
        # This mirror previously str()-sorted everything and so passed
        # queries the driver errors on (the r13/r14 id-surface gap).
        # Reject complex output columns up front — a graded query must
        # project them to a string surface (idsAsString convention).
        complex_cols = [c for c, t in zip(spark_rel.columns, spark_rel.types)
                        if any(k in str(t).upper()
                               for k in ("[]", "LIST", "MAP", "STRUCT"))]
        if complex_cols:
            print(f"FAIL {name}: array/map/struct output columns "
                  f"{complex_cols} are unsortable at the driver gate — "
                  f"grade a string projection instead")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        dc, dr = canon(drows, dcols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  spark={a}\n  duck ={b}\n  cols={sc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(oracle)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
