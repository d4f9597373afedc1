#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate: run each
oracle_sql.json entry against the sf tables, compare with the Verify parquet
dump (columns sorted by name, rows sorted, exact values)."""
import duckdb, json, sys, math
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}"); fails+=1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); fails+=1; continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        mismatch = 0
        for c in exp.columns:
            a, b = exp[c], got[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                bad = ~((a == b) | (a.isna() & b.isna()))
            else:
                bad = ~((a.astype(str) == b.astype(str)))
            n = int(bad.sum())
            if n:
                mismatch += n
                idx = bad.idxmax()
                print(f"  {name}.{c}: {n} mismatches, first exp={a[idx]!r} got={b[idx]!r}")
        if mismatch: print(f"FAIL {name}: value mismatches"); fails+=1
        else: print(f"ok   {name} ({len(exp)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}"); fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
