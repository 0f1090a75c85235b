"""AQE post-shuffle coalescing floor (VERDICT r12 item 7): at sf0.1 a
0.3 s query spends much of its time scheduling near-empty shuffle
tasks (the r12 scaling block showed 8 cores beating 32 everywhere on
the as-served layout). A/B `spark.sql.adaptive.coalescePartitions.
parallelismFirst` true (default: keep parallelism, floor 1MB
partitions) vs false (respect advisoryPartitionSizeInBytes — the
Spark-docs-recommended setting for busy clusters), interleaved
min-of-3 over the full headline on the MAINTAINED layout (the r13
primary).
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from realtime_data_warehouse_spark.cache import unpersist_all
from realtime_data_warehouse_spark.operators.maintenance import maintain_table
from realtime_data_warehouse_spark.plans.registry import QUERIES
from realtime_data_warehouse_spark.schemas import TESTDATA_TABLES
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale

from pyspark.sql import functions as F

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

spark = get_spark("ab-aqe")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()
spark.read.parquet(os.path.join(sf, "region.parquet")).count()

# maintained layout (the r13 primary)
import shutil
import tempfile

maint = tempfile.mkdtemp(prefix="ab_aqe_maint_")
for t in TESTDATA_TABLES:
    src = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(src):
        dst = os.path.join(maint, f"{t}.parquet")
        os.makedirs(dst)
        try:
            os.link(src, os.path.join(dst, "part-00000.parquet"))
        except OSError:
            shutil.copy2(src, os.path.join(dst, "part-00000.parquet"))
        maintain_table(spark, dst)

KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
best = {"pf_true": {}, "pf_false": {}}
for i in range(3):
    for label, val in (("pf_true", "true"), ("pf_false", "false")):
        spark.conf.set(KEY, val)
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, maint).write.format("noop").mode(
                "overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            d = best[label]
            d[name] = min(d.get(name, el), el)
            unpersist_all()
spark.conf.unset(KEY)
for label, d in best.items():
    print(f"{label}: total={sum(d.values()):7.3f}", flush=True)
for name in HEADLINE:
    a, b = best["pf_true"][name], best["pf_false"][name]
    flag = " <<<" if abs(a - b) > 0.1 * max(a, b) else ""
    print(f"  {name:32s} true={a:6.3f} false={b:6.3f}{flag}", flush=True)
