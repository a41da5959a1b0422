#!/usr/bin/env python3
"""DuckDB side of the events-model head-to-head (BENCHVS.md).

The reference's only published perf number is the `events` dbt model
build: dbt-duckdb materializes `select * from parquet.'<zone>/events'`
as a table, i.e. a CTAS from a hive-partitioned parquet glob into the
local .duckdb file. Replay exactly that against the SAME zone the
Spark side (graft.tools.BenchEventsModel) built and timed.

Usage: bench_events_duckdb.py <zone_dir_printed_by_the_spark_side>
"""
import json
import sys
import tempfile
import time

import duckdb


def build_once(zone: str) -> tuple[float, int]:
    db = tempfile.mktemp(prefix="graft-events-", suffix=".duckdb")
    con = duckdb.connect(db)
    con.execute("SET threads TO 32")
    t0 = time.time()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM parquet_scan("
        f"'{zone}/events/*/*.parquet', hive_partitioning=true)")
    n = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    sec = time.time() - t0
    con.close()
    return sec, n


def main() -> None:
    zone = sys.argv[1]
    cold, n1 = build_once(zone)
    second, n2 = build_once(zone)
    assert n1 == n2
    print(json.dumps({
        "bench": "events_model", "engine": "duckdb", "rows": n1,
        "cold_sec": round(cold, 2), "second_sec": round(second, 2),
        "zone": zone,
    }))


if __name__ == "__main__":
    main()
