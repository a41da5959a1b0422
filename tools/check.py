#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each <out>/<name>/ parquet (written by `sbt "runMain graft.Verify
<sfDir> <out>"`), runs the matching SQL from oracle_sql.json in DuckDB over
the same sf tables, and compares: row count, column names, and values
(exact, after sorting columns by name and rows by all columns).

Dev tool only — the shipped Scala library has no Python dependency.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        return None
    return pq.read_table(files).to_pandas()

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        s = load_spark(out, name)
        if s is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            o = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(s.columns) != sorted(o.columns):
            print(f"FAIL {name}: columns spark={sorted(s.columns)} oracle={sorted(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); n_fail += 1; continue
        sn, on = normalize(s.copy()), normalize(o.copy())
        ok = True
        for c in sn.columns:
            a, b = sn[c].values, on[c].values
            if np.issubdtype(sn[c].dtype, np.floating) or np.issubdtype(on[c].dtype, np.floating):
                af = pd.to_numeric(sn[c]).values.astype(float)
                bf = pd.to_numeric(on[c]).values.astype(float)
                bad = ~((af == bf) | (np.isnan(af) & np.isnan(bf)))
            else:
                bad = ~(pd.Series(a).astype(str).values == pd.Series(b).astype(str).values)
            if bad.any():
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} differs at sorted-row {i}: "
                      f"spark={sn[c].iloc[i]!r} oracle={on[c].iloc[i]!r} "
                      f"({int(bad.sum())} rows differ)")
                ok = False
                break
        # dtype check (schema-match approximation)
        for c in sn.columns:
            if str(sn[c].dtype) != str(on[c].dtype):
                print(f"  WARN {name}: dtype {c} spark={sn[c].dtype} oracle={on[c].dtype}")
        if ok:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        else:
            n_fail += 1
    # queries with no oracle: rows-only
    all_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
    for name in sorted(all_dirs - set(oracle)):
        s = load_spark(out, name)
        n = 0 if s is None else len(s)
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
        if n > 0: n_pass += 1
        else: n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
