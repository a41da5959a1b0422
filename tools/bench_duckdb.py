#!/usr/bin/env python3
"""Head-to-head single-node throughput: DuckDB oracle SQL vs graft.Bench.

Usage: python3 tools/bench_duckdb.py [sfDir] [benchJson]

Times every oracle query from oracle_sql.json (dumped by graft.Verify) in
DuckDB over the same parquet tables graft reads, same box, all cores
(DuckDB default). Each query is run once to warm the buffer pool, then
twice timed, keeping the min — the same steady-state protocol graft.Bench
uses. If a Bench JSON line is given (the {"metric":...} output), prints a
side-by-side table and the total ratio.

Dev tool only — the shipped Scala library has no Python dependency. The
reference delegates all relational execution to DuckDB (SURVEY.md §0), so
DuckDB on the oracle SQL *is* the reference's single-node throughput on
these queries.
"""
import sys, os, json, time, glob

import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else None
    oracle_path = None
    for cand in ["/tmp/verify_out/oracle_sql.json", "/tmp/verify_out01/oracle_sql.json"]:
        if os.path.exists(cand):
            oracle_path = cand
            break
    if len(sys.argv) > 3:
        oracle_path = sys.argv[3]
    if not oracle_path:
        sys.exit("no oracle_sql.json found; run graft.Verify first")
    oracles = json.load(open(oracle_path))

    con = duckdb.connect()  # in-memory, all cores
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        def once():
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"  {name}: DUCKDB ERROR {e}", file=sys.stderr)
                return float("nan")
            return time.perf_counter() - t0
        once()  # warm
        times[name] = min(once(), once())

    bench = None
    if bench_path and os.path.exists(bench_path):
        txt = open(bench_path).read()
        i = txt.find('{"metric"')
        if i >= 0:
            line = txt[i:].splitlines()[0].strip()
            bench = json.loads(line)
    bench_q = (bench or {}).get("queries", {})

    print(f"{'query':34s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s}")
    rows = []
    for name, td in sorted(times.items()):
        ts = bench_q.get(name)
        ratio = (ts / td) if (ts and td == td and td > 0) else None
        rows.append((name, td, ts, ratio))
        print(f"{name:34s} {td:8.3f} " +
              (f"{ts:8.3f} {ratio:7.2f}" if ratio is not None else f"{'-':>8s} {'-':>7s}"))
    if bench_q:
        # totals over MATCHED queries only — a narrowed bench JSON must
        # not deflate the ratio by comparing a subset sum to the full sum
        matched = [(td, ts) for _, td, ts, _ in rows if ts is not None and td == td]
        total_d = sum(td for td, _ in matched)
        total_s = sum(ts for _, ts in matched)
        print(f"{'TOTAL (%d matched)' % len(matched):34s} {total_d:8.2f}", end="")
        print(f" {total_s:8.2f} {total_s/total_d:7.2f}")
        slower = [(n, r) for n, _, _, r in rows if r is not None and r > 2.0]
        print(f"\n{len(slower)} queries >2x slower than DuckDB:")
        for n, r in sorted(slower, key=lambda x: -x[1])[:20]:
            print(f"  {n}: {r:.1f}x")
    else:
        total_d = sum(v for v in times.values() if v == v)
        print(f"{'TOTAL (duckdb only)':34s} {total_d:8.2f}")

if __name__ == "__main__":
    main()
