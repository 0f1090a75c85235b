import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import load_table, fan_out
from pyspark.sql import functions as F
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
import pandas as pd
_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode("overwrite").save()
li = load_table(spark, sf, "lineitem")

def pricing(src):
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    tax = (F.lit(1) + F.col("l_tax")).cast("decimal(3,2)")
    return (src.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
                 F.sum(price*disc).cast("double").alias("sum_disc_price"),
                 F.sum(price*disc*tax).cast("double").alias("sum_charge"),
                 F.count(F.lit(1)).alias("count_order")))
def corr(src):
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return src.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(20,6)")).alias("sx"),
        F.sum(p.cast("decimal(20,6)")).alias("sy"),
        F.sum((q*q).cast("decimal(24,6)")).alias("sxx"),
        F.sum((p*p).cast("decimal(28,4)")).alias("syy"),
        F.sum((q*p).cast("decimal(26,4)")).alias("sxy"))

variants = {
  "pricing_cur": lambda: pricing(li),
  "pricing_fan": lambda: pricing(fan_out(li)),
  "corr_cur": lambda: corr(li),
  "corr_fan": lambda: corr(fan_out(li.select("l_returnflag","l_quantity","l_extendedprice"))),
}
best = {k: 1e9 for k in variants}
for i in range(5):
    for k, mk in variants.items():
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k] = min(best[k], time.perf_counter()-t0)
for k, v in best.items(): print(f"{v:7.3f}  {k}")
