import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.cache import unpersist_all
from realtime_data_warehouse_spark.plans.registry import QUERIES
from realtime_data_warehouse_spark.streaming.runner import pinned_shuffle
from pyspark.sql import functions as F
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
import pandas as pd
_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode("overwrite").save()

q = QUERIES["stream_a6_delta_sum"]
# stage input (untimed)
q(spark, sf).write.format("noop").mode("overwrite").save(); unpersist_all()

res = {}
for _ in range(3):
    for n in (8, 16, 32, 64):
        with pinned_shuffle(spark, n):
            t0 = time.perf_counter()
            q(spark, sf).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter()-t0, 3)
        res.setdefault(n, []).append(el)
        unpersist_all()
for n, v in res.items(): print(f"parts={n}: min={min(v)} {v}", flush=True)
