#!/usr/bin/env python
"""Same-session A/B drain timer for one registry stream entry — the
drift-adjudication harness (round-8, VERDICT r7 item 3): run it twice
back-to-back, once from a worktree of the old code and once from HEAD,
on an otherwise-idle box, and compare the printed per-pass times. The
repo's documented between-session noise band is ±30%, so round-over-
round drift beyond that needs exactly this A/B (same box, same hour,
same corpus) rather than an assumption either way.

Usage: python scripts/ab_stream_entry.py <repo_root> <entry> [sf_dir] [passes]
Prints one JSON line: {"repo": ..., "entry": ...,
  "memory": [pass_sec...], "rocksdb": [pass_sec...]}
(per-pass times, not best-of — both the level and the spread matter).
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    repo = os.path.abspath(sys.argv[1])
    entry = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    sys.path.insert(0, repo)

    from realtime_data_warehouse_spark.cache import unpersist_all
    from realtime_data_warehouse_spark.plans.registry import QUERIES
    from realtime_data_warehouse_spark.session import (
        get_spark,
        tune_for_scale,
        use_rocksdb_state,
    )
    from realtime_data_warehouse_spark.shipping import ship_package

    spark = get_spark("ab-stream")
    tune_for_scale(spark)
    ship_package(spark)  # workers must import the A/B'd tree, not cwd's
    # same warm-up contract as bench.py: JVM + Python-worker pool
    from pyspark.sql import functions as F
    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 32).select(_noop("id").alias("v")) \
        .write.format("noop").mode("overwrite").save()

    out = {"repo": repo, "entry": entry, "sf_dir": sf_dir}
    fn = QUERIES[entry]
    for label, rocks in (("memory", False), ("rocksdb", True)):
        use_rocksdb_state(spark, rocks)
        try:
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()  # untimed: stages replay input
            unpersist_all()
            times = []
            for _ in range(passes):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                unpersist_all()
            out[label] = times
        finally:
            use_rocksdb_state(spark, False)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
