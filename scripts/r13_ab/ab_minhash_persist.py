"""dedup_minhash_lsh structural floor (VERDICT r12 item 6): the
current minhash_lsh_pairs persists the WIDE (doc_id, shingles) frame
(one shingle pass shared by the signature branch and both verify
sides) at the cost of a persist + 10 jobs. Variants, interleaved
min-of-5, identical output:

  wide   — current: persist (doc_id, shingles); 1 tokenization.
  none   — no persist: 3 tokenizations (bands + both verify sides).
  narrow — persist only the banded keys (doc_id, band_idx, band_key —
           the signature work, which is the expensive pandas_udf);
           verify sides recompute shingles (2 extra tokenizations of
           codegen'able width, no wide array in storage).
  postv  — narrow + verify arrays rebuilt relationally
           (gram_postings + collect_list) instead of the HOF shingle
           path.
Counts jobs per variant via job groups.
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

spark = get_spark("ab-minhash")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()
spark.read.parquet(os.path.join(sf, "region.parquet")).count()

THRESH = 0.8


def docs():
    return fan_out(load_table(spark, sf, "documents")).select(
        "doc_id", "text")


def verify(cands, a_sh, b_sh):
    joined = cands.join(a_sh, "doc_a").join(b_sh, "doc_b")
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.size("sh_a") + F.size("sh_b") - common)
    return (joined.withColumn("jaccard", F.round(jac, 6))
            .filter(jac >= THRESH).select("doc_a", "doc_b", "jaccard"))


def mk_wide():
    return D.minhash_lsh_pairs(docs(), threshold=THRESH)


def cands_from(bands):
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")).distinct())


def shingle_sides():
    sh = D.with_shingles(docs(), "text", 2, drop_empty=True).select(
        "doc_id", "shingles")
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"),
                  F.col("shingles").alias("sh_b"))
    return a, b


def mk_none():
    sh = D.with_shingles(docs(), "text", 2, drop_empty=True).select(
        "doc_id", "shingles")
    cands = cands_from(D.band_keys(sh, "doc_id"))
    a, b = shingle_sides()
    return verify(cands, a, b)


def mk_narrow():
    sh = D.with_shingles(docs(), "text", 2, drop_empty=True).select(
        "doc_id", "shingles")
    bands = persisted(D.band_keys(sh, "doc_id"))
    cands = cands_from(bands)
    a, b = shingle_sides()
    return verify(cands, a, b)


def mk_postv():
    sh = D.with_shingles(docs(), "text", 2, drop_empty=True).select(
        "doc_id", "shingles")
    bands = persisted(D.band_keys(sh, "doc_id"))
    cands = cands_from(bands)
    post = D.gram_postings(docs())
    arrays = post.groupBy("doc_id").agg(
        F.collect_list("s").alias("shingles"))
    a = arrays.select(F.col("doc_id").alias("doc_a"),
                      F.col("shingles").alias("sh_a"))
    b = arrays.select(F.col("doc_id").alias("doc_b"),
                      F.col("shingles").alias("sh_b"))
    return verify(cands, a, b)


variants = {"wide": mk_wide, "none": mk_none, "narrow": mk_narrow,
            "postv": mk_postv}

# result-identity check first (row sets must match exactly)
ref = {tuple(r) for r in mk_wide().collect()}
unpersist_all()
for k, mk in variants.items():
    got = {tuple(r) for r in mk().collect()}
    unpersist_all()
    assert got == ref, f"{k} differs: {len(got)} vs {len(ref)}"
print(f"identity ok: {len(ref)} pairs on all variants", flush=True)

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
