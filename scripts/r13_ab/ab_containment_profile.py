"""containment_pairs profiling (VERDICT r12 item 3): where do the
3.5-4.4 s go, what is the candidate-row count, and what does the doc
size distribution look like (the input to any stratified candidate
scheme — containment with n_out <= c*n_in implies a Jaccard floor
t/(t_den-t+c*t... see OPTIMIZATION_r13.md; pairs with huge outer docs
need the exact prefix path, but only for the few docs that ARE huge).
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from realtime_data_warehouse_spark.cache import persisted, unpersist_all
from realtime_data_warehouse_spark.operators import dedup as D
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import fan_out, load_table

from pyspark.sql import functions as F, Window

spark = get_spark("ab-containment")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()
spark.read.parquet(os.path.join(sf, "region.parquet")).count()


def docs():
    return fan_out(load_table(spark, sf, "documents"))


# ---- size distribution of distinct-shingle sets ----
post = persisted(D.gram_postings(docs()))
sizes = post.select("doc_id", "sz").distinct()
print(sizes.select(
    F.count("*").alias("docs"),
    F.min("sz"), F.expr("percentile(sz, 0.05)"),
    F.expr("percentile(sz, 0.5)"), F.expr("percentile(sz, 0.95)"),
    F.max("sz")).collect()[0], flush=True)
vocab = post.select("s").distinct().count()
print(f"vocab={vocab}", flush=True)

# ---- candidate-row count of the current prefix path ----
t_num, t_den = 9, 10
inv = post.select(F.col("doc_id"), F.col("sz").alias("n"), "s")
dfreq = persisted(inv.groupBy("s").agg(F.count(F.lit(1)).alias("dfr")))
w = Window.partitionBy("doc_id").orderBy("dfr", "s")
keep = (F.col("n") - F.floor((t_num * F.col("n") + t_den - 1) / t_den) + 1)
prefix = (inv.join(F.broadcast(dfreq), "s")
          .withColumn("rk", F.row_number().over(w))
          .filter(F.col("rk") <= keep)
          .select(F.col("doc_id").alias("inner_id"),
                  F.col("n").alias("n_in"), "s"))
raw_cand = (prefix.join(inv.select(F.col("doc_id").alias("outer_id"),
                                   F.col("n").alias("n_out"), "s"), "s")
            .filter((F.col("inner_id") != F.col("outer_id"))
                    & (F.col("n_out") * t_den >= F.col("n_in") * t_num)))
t0 = time.perf_counter()
n_raw = raw_cand.count()
print(f"raw candidate rows (with multiplicity): {n_raw} "
      f"({time.perf_counter()-t0:.2f}s)", flush=True)
t0 = time.perf_counter()
n_dist = raw_cand.select("inner_id", "outer_id").distinct().count()
print(f"distinct candidate pairs: {n_dist} "
      f"({time.perf_counter()-t0:.2f}s)", flush=True)
n_true = D.containment_join(docs(), t_num=9, t_den=10,
                            postings=D.gram_postings(docs())).count()
print(f"true containment pairs: {n_true}", flush=True)
unpersist_all()

# ---- stage timing of the full query, min-of-3 ----
times = []
for i in range(3):
    group = f"prof-{i}"
    spark.sparkContext.setJobGroup(group, "containment")
    t0 = time.perf_counter()
    D.containment_join(docs(), t_num=9, t_den=10,
                       postings=D.gram_postings(docs())).write.format(
        "noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 3))
    unpersist_all()
print(f"containment_pairs full: min={min(times)} {times}", flush=True)
