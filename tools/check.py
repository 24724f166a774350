#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify parquet
dumps against DuckDB oracle results (sorted columns, sorted rows, exact
values). Usage: check.py <outDir> <sfDir> [query ...]"""
import sys, json, glob
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    try:
        spark_df = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns {sc} vs {dc}"); fails += 1; continue
    s = spark_df[sc].sort_values(sc, ignore_index=True)
    d = duck_df[dc].sort_values(dc, ignore_index=True)
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
    # normalize dtypes for compare
    try:
        d2 = d.astype({c: s[c].dtype for c in sc})
    except Exception:
        d2 = d
    eq = s.reset_index(drop=True).equals(d2.reset_index(drop=True))
    if not eq:
        diff = (s != d2) & ~(s.isna() & d2.isna())
        bad = diff.any(axis=1)
        print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(s)}")
        print("spark:", s[bad].head(3).to_dict("records"))
        print("duck :", d2[bad].head(3).to_dict("records"))
        fails += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
