#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare.py <sfDir> <verifyOutDir> [query ...]
Reads each <out>/<name> spark parquet, runs oracle_sql.json[name] in DuckDB
over the sf parquet tables, sorts columns by name, and hash-compares values.
"""
import sys, json, os
import duckdb, pandas as pd
import pandas.util as pu

sfdir, out = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
if not names:
    names = [n for n in sorted(oracle) if os.path.isdir(os.path.join(out, n))]
fails = 0
for n in names:
    d = os.path.join(out, n)
    if not os.path.isdir(d):
        print(f"{n:28s} SKIP (no spark output)"); fails += 1; continue
    try:
        sp = pd.read_parquet(d)
        if n not in oracle:
            print(f"{n:28s} rows={len(sp)} (no oracle)"); continue
        oc = con.execute(oracle[n]).df()
        sp = sp.reindex(sorted(sp.columns), axis=1)
        oc = oc.reindex(sorted(oc.columns), axis=1)
        ok_rows = len(sp) == len(oc)
        ok_schema = list(sp.columns) == list(oc.columns)
        def h(df):
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
            num = df.select_dtypes('number').columns
            df[num] = df[num].round(6)
            return pu.hash_pandas_object(df.astype(str), index=False).sum()
        ok_hash = False
        if ok_rows and ok_schema:
            try: ok_hash = bool(h(sp) == h(oc))
            except Exception as e: ok_hash = f"HASHERR {e}"
        if ok_hash is not True:
            fails += 1
            print(f"{n:28s} FAIL rows={ok_rows} schema={ok_schema} hash={ok_hash}  spark={len(sp)} oracle={len(oc)}")
            print("  spark cols:", list(sp.columns), " oracle cols:", list(oc.columns))
            if ok_rows and ok_schema:
                try:
                    m = sp.sort_values(by=list(sp.columns)).reset_index(drop=True).astype(str).compare(
                        oc.sort_values(by=list(oc.columns)).reset_index(drop=True).astype(str))
                    print(m.head(5))
                except Exception as e: print("  diff err:", e)
        else:
            print(f"{n:28s} PASS ({len(sp)} rows)")
    except Exception as e:
        fails += 1
        print(f"{n:28s} ERR {type(e).__name__}: {e}")
sys.exit(1 if fails else 0)
