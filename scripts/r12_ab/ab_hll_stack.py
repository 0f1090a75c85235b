import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.cache import unpersist_all
from realtime_data_warehouse_spark.sources.batch import load_table
from pyspark.sql import functions as F
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
li = load_table(spark, sf, "lineitem")
_RSD = 0.05
def mk_base():
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("xo"),
        F.approx_count_distinct("l_orderkey", _RSD).alias("ao"),
        F.countDistinct("l_partkey").alias("xp"),
        F.approx_count_distinct("l_partkey", _RSD).alias("ap"))
def old():
    base = mk_base()
    def side(kc, e, a):
        return base.select("l_returnflag", F.lit(kc).alias("key_col"),
            F.col(e).cast("long").alias("exact_distinct"), F.lit(_RSD).cast("double").alias("rsd_bound"),
            (F.abs(F.col(a)-F.col(e)) <= 5*_RSD*F.col(e)).alias("within_5rsd"))
    return side("l_orderkey","xo","ao").unionByName(side("l_partkey","xp","ap"))
def new():
    base = mk_base()
    return base.select("l_returnflag",
        F.expr("stack(2, 'l_orderkey', xo, ao, 'l_partkey', xp, ap)").alias("key_col","x","a")
    ).select("l_returnflag","key_col", F.col("x").cast("long").alias("exact_distinct"),
        F.lit(_RSD).cast("double").alias("rsd_bound"),
        (F.abs(F.col("a")-F.col("x")) <= 5*_RSD*F.col("x")).alias("within_5rsd"))
best = {"old": [], "new": []}
for i in range(5):
    for k, mk in (("old", old), ("new", new)):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k].append(round(time.perf_counter()-t0,3))
        unpersist_all()
for k, v in best.items(): print(f"{min(v):7.3f}  {k}  {v}")
