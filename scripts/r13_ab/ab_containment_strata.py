"""Empirical candidate counts for the stratified containment scheme
(VERDICT r12 item 3): stratum 1 = bounded size ratio (n_out < c^2 *
n_in) via banded minhash at the implied Jaccard floor t/(1-t+c^2);
stratum 2 = large outers (bucket_out >= bucket_in + 2) via the exact
inner-prefix pigeonhole restricted to those buckets. A containment-t
pair with n_out <= c^2*n_in has Jaccard >= t/(1-t+c^2), so banding at
that floor covers stratum 1 with negligible miss probability; pairs
with larger outers land in stratum 2, which is exact. Counts both
strata's candidate rows and checks coverage of the 510 true pairs.

MEASURED VERDICT (r13, kept as the dead-end record): stratum 1
collapses 10x but the corpus' size spread (8-98 distinct shingles)
puts the candidate mass in stratum 2 (2.9M of 4.4M raw rows), and the
signature pass adds ~1 s — net a wash or worse vs the shipped plan.
"""
import math
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from realtime_data_warehouse_spark.cache import persisted, unpersist_all
from realtime_data_warehouse_spark.operators import dedup as D
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import fan_out, load_table

from pyspark.sql import functions as F, Window

spark = get_spark("ab-strata")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()

t_num, t_den = 9, 10
C_NUM, C_DEN = 9, 8          # ratio cap c = 9/8; buckets are powers of c
LOG_C = math.log(C_NUM / C_DEN)

docs = fan_out(load_table(spark, sf, "documents")).select("doc_id", "text")
post = persisted(D.gram_postings(docs))
sizes = post.select("doc_id", F.col("sz").alias("n")).distinct()
bucket = F.floor(F.log(F.col("n").cast("double")) / F.lit(LOG_C)).alias("bk")
sized = persisted(sizes.select("doc_id", "n", bucket))
print(sized.groupBy("bk").count().orderBy("bk").collect(), flush=True)

# ---- stratum 1: banded minhash (64 bands x 2 rows from the 128-perm
# signature), pairs with b_out <= b_in + 1, size window enforced ----
sh = D.with_shingles(docs, "text", 2, drop_empty=True).select(
    "doc_id", "shingles")
sig = sh.withColumn("sig", D.minhash_signature(F.col("shingles")))
B, R = 64, 2
band_sql = ", ".join(
    f"xxhash64(slice(sig, {i * R + 1}, {R}), {i})" for i in range(B))
bands = persisted(sig.select(
    "doc_id",
    F.posexplode(F.expr(f"array({band_sql})")).alias("band_idx", "band_key")))
a = bands.alias("a").join(sized.select(F.col("doc_id"),
                                       F.col("n").alias("n_a"),
                                       F.col("bk").alias("bk_a")), "doc_id")
b = bands.alias("b").join(sized.select(F.col("doc_id"),
                                       F.col("n").alias("n_b"),
                                       F.col("bk").alias("bk_b")), "doc_id")
t0 = time.perf_counter()
s1_raw = (a.select(F.col("doc_id").alias("ida"), "band_idx", "band_key",
                   "n_a", "bk_a")
          .join(b.select(F.col("doc_id").alias("idb"), "band_idx",
                         "band_key", "n_b", "bk_b"),
                ["band_idx", "band_key"])
          .filter((F.col("ida") != F.col("idb"))
                  # inner = ida, outer = idb: outer within 1 bucket up,
                  # and outer >= t*inner (containment necessary cond)
                  & (F.col("bk_b") <= F.col("bk_a") + 1)
                  & (F.col("n_b") * t_den >= F.col("n_a") * t_num)))
n_s1_raw = s1_raw.count()
n_s1 = s1_raw.select("ida", "idb").distinct().count()
print(f"stratum1 banded: raw={n_s1_raw} distinct={n_s1} "
      f"({time.perf_counter()-t0:.2f}s)", flush=True)

# ---- stratum 2: exact prefix, bucket-exploded (b_out >= b_in + 2) ----
inv = post.select(F.col("doc_id"), F.col("sz").alias("n"), "s")
dfreq = persisted(inv.groupBy("s").agg(F.count(F.lit(1)).alias("dfr")))
w = Window.partitionBy("doc_id").orderBy("dfr", "s")
keep = (F.col("n") - F.floor((t_num * F.col("n") + t_den - 1) / t_den) + 1)
max_bk = sized.agg(F.max("bk")).collect()[0][0]
prefix = (inv.join(F.broadcast(dfreq), "s")
          .withColumn("rk", F.row_number().over(w))
          .filter(F.col("rk") <= keep)
          .join(sized.select("doc_id", "bk"), "doc_id")
          .select(F.col("doc_id").alias("inner_id"),
                  F.col("n").alias("n_in"), F.col("bk"), "s"))
# explode each prefix row to the buckets >= bk+2 it must probe
probe = prefix.select(
    "inner_id", "n_in", "s",
    F.explode(F.sequence(F.col("bk") + 2, F.lit(int(max_bk))))
    .alias("bk_out")).filter(F.col("bk_out") <= int(max_bk))
inv_b = inv.join(sized.select("doc_id", "bk"), "doc_id").select(
    F.col("doc_id").alias("outer_id"), F.col("n").alias("n_out"),
    F.col("bk").alias("bk_out"), "s")
t0 = time.perf_counter()
s2_raw = (probe.join(inv_b, ["s", "bk_out"])
          .filter(F.col("n_out") * t_den >= F.col("n_in") * t_num))
n_s2_raw = s2_raw.count()
n_s2 = s2_raw.select("inner_id", "outer_id").distinct().count()
print(f"stratum2 prefix(large outers): raw={n_s2_raw} distinct={n_s2} "
      f"({time.perf_counter()-t0:.2f}s)", flush=True)

# ---- coverage: every true pair must be in stratum1 ∪ stratum2 ----
truth = D.containment_join(docs, t_num=9, t_den=10,
                           postings=D.gram_postings(docs)).select(
    "inner_id", "outer_id")
cand = (s1_raw.select(F.col("ida").alias("inner_id"),
                      F.col("idb").alias("outer_id"))
        .unionByName(s2_raw.select("inner_id", "outer_id")).distinct())
missed = truth.join(cand, ["inner_id", "outer_id"], "left_anti").count()
n_truth = truth.count()
print(f"coverage: truth={n_truth} missed={missed}", flush=True)
unpersist_all()
