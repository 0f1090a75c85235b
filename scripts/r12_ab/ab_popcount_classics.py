import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import load_table, fan_out
from realtime_data_warehouse_spark.cache import unpersist_all
from realtime_data_warehouse_spark.operators import dedup as D
from pyspark.sql import functions as F
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
import pandas as pd
_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode("overwrite").save()

def fold(a_col, b_col, n_words):
    return F.aggregate(F.zip_with(a_col, b_col, lambda x, y: F.bit_count(x.bitwiseAND(y))),
                       F.lit(0), lambda acc, v: acc + v)
def unroll(a_col, b_col, n_words):
    tot = None
    for i in range(1, n_words + 1):
        t = F.bit_count(F.element_at(F.col(a_col), i).bitwiseAND(F.element_at(F.col(b_col), i)))
        tot = t if tot is None else (tot + t)
    return tot

docs = fan_out(load_table(spark, sf, "documents"))
def mk_containment():
    return D.containment_join(docs, t_num=9, t_den=10, postings=D.gram_postings(docs))

# classics variants
li_plain = load_table(spark, sf, "lineitem")
part = load_table(spark, sf, "part")
def disjunctive(li):
    q = F.col("l_quantity")
    arm1 = ((F.col("p_brand")=="Brand#12") & F.col("p_size").between(1,5) & (q>=1) & (q<=11))
    arm2 = ((F.col("p_brand")=="Brand#23") & F.col("p_size").between(1,10) & (q>=10) & (q<=20))
    arm3 = ((F.col("p_brand")=="Brand#34") & F.col("p_size").between(1,15) & (q>=20) & (q<=30))
    rev = (F.col("l_extendedprice").cast("decimal(12,2)") * (F.lit(1)-F.col("l_discount")).cast("decimal(3,2)"))
    return (li.join(F.broadcast(part), F.col("l_partkey")==F.col("p_partkey"))
            .filter(arm1|arm2|arm3)
            .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines")))
def small_qty(li):
    qty = F.col("l_quantity").cast("decimal(12,2)")
    pstats = (li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"), F.sum(qty).alias("sumq"))
              .withColumnRenamed("l_partkey","ps_partkey"))
    p23 = part.filter(F.col("p_brand")=="Brand#23")
    small = (li.join(F.broadcast(p23), F.col("l_partkey")==F.col("p_partkey"))
             .join(F.broadcast(pstats), F.col("l_partkey")==F.col("ps_partkey"))
             .filter(qty*F.lit(5)*F.col("cnt").cast("decimal(10,0)") < F.col("sumq")))
    return small.agg((F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")/F.lit(7.0)).alias("a"),
                     F.count(F.lit(1)).alias("n"))

variants = {
  "containment_fold":  lambda: (setattr(D, "_mask_intersect", fold), mk_containment())[1],
  "containment_unroll":lambda: (setattr(D, "_mask_intersect", unroll), mk_containment())[1],
  "disjunctive_plain": lambda: disjunctive(li_plain),
  "disjunctive_fan":   lambda: disjunctive(fan_out(li_plain)),
  "smallqty_plain":    lambda: small_qty(li_plain),
  "smallqty_fan":      lambda: small_qty(fan_out(li_plain)),
}
best = {k: [] for k in variants}
for i in range(5):
    for k, mk in variants.items():
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k].append(round(time.perf_counter()-t0, 3))
        unpersist_all()
for k, v in best.items(): print(f"{min(v):7.3f}  {k}  {v}")
