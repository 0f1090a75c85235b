#!/usr/bin/env python
"""Physical-plan shape audit over every registered query.

Writes PLAN_AUDIT.json at the repo root: for each `queries()` entry,
the scale-relevant shape of its physical plan —

  scans        : # parquet FileScans (data passes over storage)
  exchanges    : # hash-partitioning shuffles
  broadcasts   : # broadcast exchanges (dim/config sides)
  sort_merge   : # sort-merge joins
  bhj          : # broadcast-hash joins
  windows      : # window operator instances
  cartesian    : CartesianProduct present (only the labeled
                 brute-force ANN baseline may set this)
  nested_loop  : BroadcastNestedLoopJoin present (same caveat)
  take_ordered : TakeOrderedAndProject present (top-k without a
                 global sort)
  codegen      : # WholeStageCodegen spans (JVM-fused pipelines)

This is the 100 TB design discipline (SURVEY §7, README scale notes)
made auditable per query: a regression that adds an accidental
cartesian, un-broadcasts a dim join, or doubles the shuffle count for
a query shows up as a diff of this committed artifact. Streaming
(`stream_*`) entries are skipped — they execute jobs inside the
builder; their plan discipline is pinned by tests/test_plans.py and
the streaming parity suite instead.

Usage: python scripts/plan_audit.py [sf_dir] [out_json]
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "PLAN_AUDIT.json")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod  # noqa: F401  (applies session prep)

    from realtime_data_warehouse_spark.plans.registry import QUERIES
    from realtime_data_warehouse_spark.shipping import ship_package

    # Raw QUERIES skip the entry wrapper's _prepare, so the package is
    # never shipped to Python workers — queries that execute helper
    # jobs during plan BUILD (k-means training mapInPandas in
    # ann_ivf_trained_topk) then die with an import error when the
    # audit runs outside the repo root. Ship explicitly.
    ship_package(spark)

    out: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if name.startswith("stream_"):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            out[name] = {
                "scans": plan.count("FileScan parquet"),
                "exchanges": plan.count("Exchange hashpartitioning"),
                "broadcasts": plan.count("BroadcastExchange"),
                "sort_merge": plan.count("SortMergeJoin"),
                "bhj": plan.count("BroadcastHashJoin"),
                "windows": plan.count("Window"),
                "cartesian": "CartesianProduct" in plan,
                "nested_loop": "BroadcastNestedLoopJoin" in plan,
                "take_ordered": "TakeOrderedAndProject" in plan,
                "codegen": plan.count("WholeStageCodegen"),
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
    meta = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_errors": sum(1 for v in out.values() if "error" in v),
        "n_cartesian": sum(1 for v in out.values() if v.get("cartesian")),
        "n_nested_loop": sum(1 for v in out.values() if v.get("nested_loop")),
    }
    with open(out_json, "w") as f:
        json.dump({"_meta": meta, **out}, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
