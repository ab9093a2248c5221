#!/usr/bin/env python3
"""Local oracle cross-check: run every entry of <outDir>/oracle_sql.json
in DuckDB over the sf tables and compare against the parquet the Verify
main dumped per query. The comparison is ORDER-INDEPENDENT and runs
entirely inside DuckDB: both sides canonicalize each cell (doubles to 6
significant digits, blobs to hex, float lists element-wise, everything
else CAST to VARCHAR), columns align by sorted name, and the result is
(row count, sum of per-row hashes).

A per-oracle time budget (ORACLE_TIMEOUT_S, default 60) interrupts
oracles that are intractable at the chosen scale (e.g. the all-pairs
n-gram Jaccard oracle is O(n^2) in SQL); those report as
skipped_slow_oracle, not failures — the driver checks them at sf0.01.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> <reportJson>
"""
import json
import os
import sys
import threading

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(col, typ):
    t = typ.upper()
    q = f'"{col}"'
    if t in ("DOUBLE", "FLOAT", "REAL"):
        expr = f"printf('%.6g', {q})"
    elif t.endswith("[]") and t.rstrip("[]") in ("DOUBLE", "FLOAT", "REAL"):
        expr = f"array_to_string(list_transform({q}, x -> printf('%.6g', x)), ',')"
    elif t == "BLOB":
        expr = f"hex({q})"
    else:
        expr = f"CAST({q} AS VARCHAR)"
    return f"coalesce({expr}, chr(1))"


def fingerprint(con, src_sql):
    cur = con.execute(f"SELECT * FROM ({src_sql}) LIMIT 0")
    cols = [(d[0], str(d[1])) for d in cur.description]
    exprs = [canon(c, t) for c, t in sorted(cols, key=lambda ct: ct[0].lower())]
    row = f"hash(concat_ws(chr(2), {', '.join(exprs)}))"
    n, h = con.execute(
        f"SELECT count(*), coalesce(sum({row}), 0) FROM ({src_sql})").fetchone()
    return sorted(c.lower() for c, _ in cols), int(n), int(h)


def main(sf_dir, out_dir, report_path):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    budget = float(os.environ.get("ORACLE_TIMEOUT_S", "60"))
    report, fails, skipped = {}, 0, 0
    for name in sorted(oracle):
        entry = {"match": False, "err": None}
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        try:
            ocols, on, oh = fingerprint(con, oracle[name])
            spath = os.path.join(out_dir, name)
            scols, sn, sh = fingerprint(
                con, f"SELECT * FROM '{spath}/*.parquet'")
            entry.update(spark_rows=sn, oracle_rows=on,
                         rows_match=(sn == on), cols_match=(scols == ocols),
                         hash_match=(sh == oh))
            entry["match"] = entry["rows_match"] and entry["cols_match"] \
                and entry["hash_match"]
        except duckdb.InterruptException:
            entry = {"match": None, "skipped_slow_oracle": True,
                     "err": f"oracle exceeded {budget}s at this scale"}
        except Exception as e:  # noqa: BLE001
            if "INTERRUPT" in str(e).upper():
                entry = {"match": None, "skipped_slow_oracle": True,
                         "err": f"oracle exceeded {budget}s at this scale"}
            else:
                entry["err"] = str(e)[:300]
        finally:
            timer.cancel()
        if entry["match"] is None:
            skipped += 1
        elif not entry["match"]:
            fails += 1
        report[name] = entry
    summary = {"sf_dir": sf_dir, "queries": len(report),
               "matched": len(report) - fails - skipped, "failed": fails,
               "skipped_slow_oracle": skipped}
    json.dump({"summary": summary, "results": report},
              open(report_path, "w"), indent=1)
    print(json.dumps(summary))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
