#!/usr/bin/env python3
"""Dev-only local correctness check mirroring the driver's t2 gate.

NOT part of the shipped Scala library — this script exists so the builder
can validate `SparkEntry.queries` against the DuckDB oracle before the
driver does. Usage:

    python tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already run
(or run it here with --run).
"""
import json, sys, subprocess, math
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # mirror the driver: sort columns by name, then sort rows, then hash
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pdir = OUT / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if sorted(g.columns) != sorted(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        mism = []
        for c in g.columns:
            a, b = g[c], e[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                bad = ~((a.isna() & b.isna()) | (a == b))
            else:
                bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
            if bad.any():
                i = bad.idxmax()
                mism.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r}")
        if mism:
            print(f"FAIL {name}: {'; '.join(mism[:3])}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
