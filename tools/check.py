#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare against the Spark parquet dumps
(sort columns by name, sort rows, compare values)."""
import sys, os, json, glob
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        bad.append((name, "missing spark output")); continue
    try:
        got = pd.read_parquet(pq)
        want = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        bad.append((name, f"cols {list(got.columns)} vs {list(want.columns)}")); continue
    if len(got) != len(want):
        bad.append((name, f"rows {len(got)} vs {len(want)}")); continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    try:
        for c in gs.columns:
            a, b = gs[c], ws[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), atol=1e-9, rtol=0, equal_nan=True):
                    raise AssertionError(f"col {c} float mismatch")
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    raise AssertionError(f"col {c} mismatch")
        ok.append(name)
    except AssertionError as e:
        bad.append((name, str(e)))

print(f"OK ({len(ok)}): {' '.join(ok)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(1 if bad else 0)
