#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sf_dir] [out_dir]
Assumes graft.Verify has already written out_dir (see scripts/verify.sh).
Loads each <name>/ parquet, runs the oracle SQL in DuckDB over the same
sf_dir tables, sorts columns by name + rows by all columns, compares
values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails, passes, rows_only = [], [], []
names = sorted(os.listdir(OUT))
# an oracle whose Spark query failed to write output is a FAIL, not a skip
for name in sorted(set(oracle) - set(names)):
    fails.append((name, "no Spark output written (query threw?)"))
for name in names:
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    g, e = norm(got.copy()), norm(exp.copy())
    if list(g.columns) != list(e.columns):
        fails.append((name, f"schema: spark={list(g.columns)} duck={list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"rows: spark={len(g)} duck={len(e)}"))
        continue
    diff_cols = []
    for c in g.columns:
        a, b = g[c], e[c]
        # the driver hashes values: int 1540 vs float 1540.0 mismatch even
        # when numerically equal (DuckDB HUGEINT sums come back as float64)
        ints = ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64")
        ai, bi = str(a.dtype) in ints, str(b.dtype) in ints
        af, bf = str(a.dtype).startswith("float"), str(b.dtype).startswith("float")
        if (ai and bf) or (af and bi):
            diff_cols.append(f"{c}: dtype spark={a.dtype} duck={b.dtype} (driver hash mismatch)")
            continue
        try:
            same = (a.values == b.values) | (a.isna().values & b.isna().values)
        except Exception:
            same = a.astype(str).values == b.astype(str).values
        if not same.all():
            i = int((~same).argmax())
            diff_cols.append(f"{c}[row{i}]: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
    if diff_cols:
        fails.append((name, "; ".join(diff_cols[:3])))
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(rows_only)}: {' '.join(n for n, _ in rows_only)}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("ALL GREEN")
