"""decontaminate_neardup persist-shape A/B (follow-up to the
minhash_lsh_pairs narrow-persist win): the cross-corpus join persists
the WIDE (doc_id, shingles) frame consumed 4 ways (train bands, bench
bands, train verify, bench verify). Variants, interleaved min-of-5,
identical output:

  wide   — current: persist (doc_id, shingles), split per cohort.
  narrow — persist the banded keys of each cohort (the signature
           pandas_udf work); verify sides recompute shingles.
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from realtime_data_warehouse_spark.cache import persisted, unpersist_all
from realtime_data_warehouse_spark.operators import dedup as D
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import fan_out, load_table

from pyspark.sql import functions as F

spark = get_spark("ab-decontam")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()

BENCH = "doc_id % 13 = 0"
T = 0.8


def mk_wide():
    docs = fan_out(load_table(spark, sf, "documents"))
    sh = persisted(
        D.with_shingles(docs.select("doc_id", "text"), "text", 2,
                        drop_empty=True).select("doc_id", "shingles"))
    train = sh.filter(~F.expr(BENCH)).withColumnRenamed("doc_id", "train_id")
    bench = sh.filter(F.expr(BENCH)).withColumnRenamed("doc_id", "bench_id")
    return D.minhash_lsh_join(train, bench, "train_id", "bench_id",
                              threshold=T)


def mk_narrow():
    docs = fan_out(load_table(spark, sf, "documents"))
    sh = D.with_shingles(docs.select("doc_id", "text"), "text", 2,
                         drop_empty=True).select("doc_id", "shingles")
    bands = persisted(D.band_keys(sh, "doc_id"))
    bl = bands.filter(~F.expr(BENCH)).withColumnRenamed(
        "doc_id", "train_id")
    br = bands.filter(F.expr(BENCH)).withColumnRenamed("doc_id", "bench_id")
    cands = (bl.join(br, ["band_idx", "band_key"])
             .select("train_id", "bench_id").distinct())
    lt = sh.filter(~F.expr(BENCH)).select(
        F.col("doc_id").alias("train_id"), F.col("shingles").alias("lt"))
    rt = sh.filter(F.expr(BENCH)).select(
        F.col("doc_id").alias("bench_id"), F.col("shingles").alias("rt"))
    t = F.lit(T)
    verified = (
        cands.join(lt, "train_id").join(rt, "bench_id")
        .withColumn("lsz", F.size("lt")).withColumn("rsz", F.size("rt"))
        .withColumn("inter", F.size(F.array_intersect("lt", "rt")))
        .withColumn("uni", F.col("lsz") + F.col("rsz") - F.col("inter"))
        .filter((F.col("rsz") >= F.ceil(F.col("lsz") * t))
                & (F.col("lsz") >= F.ceil(F.col("rsz") * t))
                & (F.col("inter") >= F.ceil(t * F.col("uni"))))
    )
    jac = F.col("inter").cast("double") / F.col("uni").cast("double")
    return verified.select(
        "train_id", "bench_id",
        jac.cast("decimal(6,4)").cast("double").alias("jaccard"))


variants = {"wide": mk_wide, "narrow": mk_narrow}
ref = {tuple(r) for r in mk_wide().collect()}
unpersist_all()
for k, mk in variants.items():
    got = {tuple(r) for r in mk().collect()}
    unpersist_all()
    assert got == ref, f"{k} differs: {len(got)} vs {len(ref)}"
print(f"identity ok: {len(ref)} pairs", flush=True)

best = {k: [] for k in variants}
jobs = {}
for i in range(5):
    for k, mk in variants.items():
        group = f"ab-{k}-{i}"
        spark.sparkContext.setJobGroup(group, k)
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k].append(round(time.perf_counter() - t0, 3))
        jobs[k] = len(spark.sparkContext.statusTracker()
                      .getJobIdsForGroup(group))
        unpersist_all()
for k, v in best.items():
    print(f"{k}: min={min(v):7.3f}  jobs={jobs[k]}  {v}", flush=True)
