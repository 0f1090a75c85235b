import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import load_table, fan_out
from realtime_data_warehouse_spark.cache import unpersist_all
from realtime_data_warehouse_spark.operators.agg import tumble
from realtime_data_warehouse_spark.operators.joins import snowflake_join
from pyspark.sql import functions as F, Window
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
import pandas as pd
_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode("overwrite").save()

li0 = load_table(spark, sf, "lineitem")
part = load_table(spark, sf, "part")
orders0 = load_table(spark, sf, "orders")
customer = load_table(spark, sf, "customer")
nation = load_table(spark, sf, "nation")
region = load_table(spark, sf, "region")

def sku_window(li):
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    agg = tumble(li.withColumn("amount", price*disc), "l_shipdate", "1 day", keys=["l_partkey"],
                 aggs={"order_amount": F.sum("amount").cast("double"),
                       "sku_num": F.sum(F.col("l_quantity").cast("long"))})
    e = snowflake_join(agg, [(part, agg["l_partkey"]==F.col("p_partkey"), ("p_partkey","p_name","p_brand"))], how="inner")
    return e.select("stt","edt","cur_date", F.col("l_partkey").alias("sku_id"),
                    F.col("p_name").alias("sku_name"), F.col("p_brand").alias("trademark"),
                    "order_amount","sku_num")
def topk(li):
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    per_sku = (li.join(F.broadcast(part.select("p_partkey","p_brand")), li["l_partkey"]==F.col("p_partkey"))
               .groupBy("p_brand", F.col("l_partkey").alias("sku_id"))
               .agg(F.sum(price*disc).alias("rev_dec")))
    w = Window.partitionBy("p_brand").orderBy(F.col("rev_dec").desc(), F.col("sku_id"))
    return (per_sku.withColumn("rk", F.row_number().over(w)).filter(F.col("rk")<=3)
            .select("p_brand","sku_id",F.col("rev_dec").cast("double").alias("revenue"),"rk"))
def province(orders):
    wide = snowflake_join(orders, [
        (customer, orders["o_custkey"]==F.col("c_custkey"), ("c_custkey","c_nationkey")),
        (nation, F.col("c_nationkey")==F.col("n_nationkey"), ("n_nationkey","n_name","n_regionkey")),
        (region, F.col("n_regionkey")==F.col("r_regionkey"), ("r_regionkey","r_name"))], how="inner")
    return (wide.groupBy(F.col("n_name").alias("p"), F.col("r_name").alias("r"))
            .agg(F.count_distinct("o_orderkey").alias("oc"), F.count_distinct("o_custkey").alias("uc"),
                 F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("amt")))
def pricing(li):
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    tax = (F.lit(1) + F.col("l_tax")).cast("decimal(3,2)")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag","l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("a"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("b"),
                 F.sum(price*disc).cast("double").alias("c"),
                 F.sum(price*disc*tax).cast("double").alias("d"),
                 F.count(F.lit(1)).alias("e")))

variants = {
  "sku_plain": lambda: sku_window(li0), "sku_fan": lambda: sku_window(fan_out(li0)),
  "topk_plain": lambda: topk(li0), "topk_fan": lambda: topk(fan_out(li0)),
  "prov_plain": lambda: province(orders0), "prov_fan": lambda: province(fan_out(orders0)),
  "pricing_plain": lambda: pricing(li0), "pricing_fan": lambda: pricing(fan_out(li0)),
}
best = {k: [] for k in variants}
for i in range(5):
    for k, mk in variants.items():
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k].append(round(time.perf_counter()-t0, 3))
        unpersist_all()
for k, v in best.items(): print(f"{min(v):7.3f}  {k}  {v}")
