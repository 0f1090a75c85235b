#!/usr/bin/env python
"""Round-13 optimization measurement harness (r12_measure.py, retargeted).

Times individual registry queries through the noop sink (guide §1.4)
with min-of-N passes, and optionally dumps .explain("formatted") to
plans/r13/<query>_<tag>.txt (guide §1: capture the plan shape before
and after every change).

Usage:
  python scripts/r13_measure.py q1 q2 ...            # time only
  python scripts/r13_measure.py --explain before q1  # also dump plans
  python scripts/r13_measure.py --passes 2 q1
  python scripts/r13_measure.py --all-headline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_data_warehouse_spark.cache import unpersist_all  # noqa: E402
from realtime_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale  # noqa: E402

HEADLINE = [
    "pricing_summary", "dws_traffic_page_view_window", "dws_keyword_count",
    "dwd_trade_order_detail", "dwd_trade_pay_suc_interval",
    "dws_sku_order_window", "dws_province_order_window",
    "a6_latest_per_key_sum", "dim_config_routing", "dwd_log_split",
    "topk_parts_per_brand", "text_stats", "dedup_minhash_lsh",
    "ann_brute_topk", "range_join_promo_windows", "time_bucket_rollup_events",
    "percentile_revenue", "curation_pipeline", "decontaminate_train",
    "quality_repetition", "label_centroids",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="tag (before/after): dump plans/r13/<q>_<tag>.txt")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--phases", action="store_true",
                    help="break one pass into build/analyze/plan/exec")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = list(args.names)
    if args.all_headline:
        names = HEADLINE + [n for n in names if n not in HEADLINE]

    spark = get_spark("r13-measure")
    tune_for_scale(spark)

    # warm up engine (same discipline as bench.py)
    import pandas as pd  # noqa: F401,PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415
    _noop = F.pandas_udf(lambda s: s, "long")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark.range(0, 10_000, 1, cpus).select(_noop("id").alias("v")).write \
        .format("noop").mode("overwrite").save()
    spark.range(1000).repartition(8).count()
    spark.read.parquet(os.path.join(args.sf_dir, "region.parquet")).count()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    if args.explain:
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, object] = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain:
            df = fn(spark, args.sf_dir)
            with open(os.path.join(plan_dir,
                                   f"{name}_{args.explain}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            unpersist_all()
        if args.phases:
            # one instrumented pass: DataFrame construction (py4j
            # chatter), analysis, optimize+physical planning, then
            # execution (incl. AQE re-planning)
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.schema  # noqa: B018 — forces analysis
            t2 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t3 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t4 = time.perf_counter()
            unpersist_all()
            print(f"{name}: build={t1-t0:.3f} analyze={t2-t1:.3f} "
                  f"plan={t3-t2:.3f} exec={t4-t3:.3f} total={t4-t0:.3f}",
                  flush=True)
        times = []
        n_jobs = 0
        for i in range(args.passes):
            group = f"r13-{name}-{i}"
            spark.sparkContext.setJobGroup(group, f"r13/{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            n_jobs = len(spark.sparkContext.statusTracker()
                         .getJobIdsForGroup(group))
            unpersist_all()
        out[name] = {"best": min(times), "passes": times, "jobs": n_jobs}
        print(f"{min(times):8.3f}  {name}  jobs={n_jobs}  {times}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
