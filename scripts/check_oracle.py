#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata tables and compare (schema + sorted rows) against
the parquet that graft.Verify dumped.

Usage: python3 scripts/check_oracle.py [sfDir] [verifyOutDir]
(Driver-side tooling only — the shipped Scala library does not depend on it.)
"""
import duckdb, glob, json, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

# subset Verify runs write oracle_sql_subset.json so they can't clobber a
# full run's oracle_sql.json; a FULL Verify deletes any stale subset file
# in its outDir, so when both exist the subset one is newer. Say which
# file is in use so a narrowed check can't pass silently.
import os
_subset = f"{out}/oracle_sql_subset.json"
_src = _subset if os.path.exists(_subset) else f"{out}/oracle_sql.json"
if _src == _subset:
    print(f"NOTE: subset oracle file in use: {_src}")
oracle = json.load(open(_src))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        o = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails.append(name); continue
    s = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    o = o.reindex(sorted(o.columns), axis=1)
    s = s.reindex(sorted(s.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
        fails.append(name); continue
    if [str(t) for t in o.dtypes] != [str(t) for t in s.dtypes]:
        print(f"FAIL {name}: dtypes oracle={dict(o.dtypes.astype(str))} "
              f"spark={dict(s.dtypes.astype(str))}")
        fails.append(name); continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
        fails.append(name); continue
    cols = list(o.columns)
    o2 = o.sort_values(by=cols, na_position="first").reset_index(drop=True)
    s2 = s.sort_values(by=cols, na_position="first").reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(o2, s2, check_dtype=False, check_exact=True)
        print(f"ok   {name} ({len(s)} rows)")
    except AssertionError as e:
        msg = str(e).replace("\n", " | ")[:400]
        print(f"FAIL {name}: values differ: {msg}")
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-checked queries pass")
if fails:
    print("FAILED:", " ".join(fails)); sys.exit(1)
