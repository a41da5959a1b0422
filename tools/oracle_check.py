#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle comparison.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name>.parquet dir in verifyOutDir, run oracle_sql.json[name] in
DuckDB against the same sf tables, sort columns by name, hash values, and
report match/mismatch. Mirrors the driver's CORRECTNESS check so we can
iterate locally before a round ends.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame):
    rows = ["|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    import hashlib
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL  {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_bad += 1
            continue
        s, k = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(k.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(k.columns)}")
            n_bad += 1
            continue
        if len(s) != len(k):
            print(f"FAIL  {name}: rows {len(s)} vs {len(k)}")
            n_bad += 1
            continue
        hs, hk = frame_hash(s), frame_hash(k)
        if hs != hk:
            print(f"FAIL  {name}: hash mismatch")
            merged = s.compare(k) if s.shape == k.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
            n_bad += 1
        else:
            print(f"ok    {name} ({len(s)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
