#!/usr/bin/env python
"""Measured single-engine baseline for the headline bench queries.

The reference publishes NO performance numbers (see BASELINE.md), so
the driver's "within 2x of baseline" gate has had no numeric anchor
for four rounds. This script pins one: the wall time DuckDB — a
state-of-the-art single-node OLAP engine — needs to run the EXACT
oracle SQL of each headline query on the same parquet files, same
box. It is a clearly-labeled reference point, not a claim that DuckDB
and Spark are equivalent systems (DuckDB runs single-process with no
shuffle or fault-tolerance machinery; Spark pays JVM+plan overheads
that buy cluster scale-out). Comparing per-query seconds against
BENCH_r*.json makes bench_vs_baseline auditable.

Usage: python scripts/duckdb_baseline.py [sf_dir] [threads]
Prints one JSON line; paste the table into BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import duckdb

    from bench import HEADLINE
    from realtime_data_warehouse_spark.plans.registry import ORACLE_SQL

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    timings: dict[str, float] = {}
    skipped: list[str] = []
    for _ in range(3):  # min-of-3, same discipline as bench.py
        for name in HEADLINE:
            sql = ORACLE_SQL.get(name)
            if sql is None:
                if name not in skipped:
                    skipped.append(name)
                continue
            t0 = time.perf_counter()
            con.execute(sql).fetchall()  # full materialization
            el = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, el), el)

    print(json.dumps({
        "metric": "duckdb_oracle_baseline_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf_dir": sf_dir,
        "threads": threads,
        "skipped_no_oracle": skipped,
        "note": ("DuckDB running each headline query's EXACT oracle "
                 "SQL on the same parquet; min of 3; single-process, "
                 "no shuffle/fault-tolerance machinery"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
