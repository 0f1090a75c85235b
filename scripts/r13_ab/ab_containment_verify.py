"""containment_pairs verify-attach A/B (VERDICT r12 item 3, follow-up
to the strata dead end): the static plan shows the 4.4M-row candidate
stream SortMergeJoined TWICE (by inner_id, then outer_id) just to
attach the 5000-row mask table — guide §8's 'audit how the proxy's
decisions get re-attached' rule, in miniature. Variants, interleaved
min-of-5, identical output:

  cur    — current containment_join (AQE decides the mask joins).
  bcast  — explicit F.broadcast on both mask sides.
  inline — masks attached to prefix/postings BEFORE the candidate
           join (one broadcast each), so the popcount runs inside the
           candidate join's map stage: zero post-candidate shuffles.
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from realtime_data_warehouse_spark.cache import persisted, unpersist_all
from realtime_data_warehouse_spark.operators import dedup as D
from realtime_data_warehouse_spark.operators.dedup import _mask_intersect
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import fan_out, load_table

from pyspark.sql import functions as F, Window

spark = get_spark("ab-cverify")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()

t_num, t_den = 9, 10


def docs():
    return fan_out(load_table(spark, sf, "documents"))


def mk_cur():
    return D.containment_join(docs(), t_num=t_num, t_den=t_den,
                              postings=D.gram_postings(docs()))


def build_parts():
    inv = persisted(D.gram_postings(docs()).select(
        F.col("doc_id"), F.col("sz").alias("n"), "s"))
    dfreq = persisted(inv.groupBy("s").agg(F.count(F.lit(1)).alias("dfr")))
    vocab = dfreq.count()
    n_words = (vocab + 63) // 64
    w = Window.partitionBy("doc_id").orderBy("dfr", "s")
    keep = (F.col("n")
            - F.floor((t_num * F.col("n") + t_den - 1) / t_den) + 1)
    prefix = (inv.join(F.broadcast(dfreq), "s")
              .withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= keep)
              .select(F.col("doc_id").alias("inner_id"),
                      F.col("n").alias("n_in"), "s"))
    bit_idx = dfreq.select(
        "s", (F.row_number().over(Window.orderBy("s")) - 1).alias("__bit"))
    masks = (
        inv.join(F.broadcast(bit_idx), "s")
        .groupBy("doc_id", "n")
        .agg(F.collect_list("__bit").alias("__bits"))
        .select(
            F.col("doc_id"), F.col("n"),
            F.expr(
                f"transform(sequence(0, {n_words - 1}), w -> "
                "aggregate(filter(__bits, b -> b div 64 = w), 0L, "
                "(acc, b) -> acc | shiftleft(1L, b % 64)))"
            ).alias("__mask"),
        )
    )
    return inv, prefix, masks, n_words


def out_select(common):
    return (
        common.filter(F.col("common") * t_den >= F.col("n_inner") * t_num)
        .select("inner_id", "outer_id",
                (F.col("common") / F.col("n_inner").cast("double"))
                .cast("decimal(6,4)").cast("double").alias("containment"))
    )


def mk_bcast():
    inv, prefix, masks, n_words = build_parts()
    raw_cand = (
        prefix.join(inv.select(F.col("doc_id").alias("outer_id"),
                               F.col("n").alias("n_out"), "s"), "s")
        .filter((F.col("inner_id") != F.col("outer_id"))
                & (F.col("n_out") * t_den >= F.col("n_in") * t_num))
        .select("inner_id", "outer_id"))
    ia = masks.select(F.col("doc_id").alias("inner_id"),
                      F.col("n").alias("n_inner"),
                      F.col("__mask").alias("__ma"))
    ib = masks.select(F.col("doc_id").alias("outer_id"),
                      F.col("__mask").alias("__mb"))
    common = (
        raw_cand.join(F.broadcast(ia), "inner_id")
        .join(F.broadcast(ib), "outer_id")
        .withColumn("common", _mask_intersect("__ma", "__mb", n_words))
        .filter(F.col("common") * t_den >= F.col("n_inner") * t_num)
        .select("inner_id", "outer_id", "n_inner", "common")
        .distinct())
    return out_select(common)


def mk_inline():
    inv, prefix, masks, n_words = build_parts()
    pmask = masks.select(F.col("doc_id").alias("inner_id"),
                         F.col("__mask").alias("__ma"))
    omask = masks.select(F.col("doc_id").alias("outer_id"),
                         F.col("n").alias("n_out"),
                         F.col("__mask").alias("__mb"))
    pre = prefix.join(F.broadcast(pmask), "inner_id").select(
        "inner_id", F.col("n_in").alias("n_inner"), "s", "__ma")
    post = inv.select(F.col("doc_id").alias("outer_id"), "s").join(
        F.broadcast(omask), "outer_id")
    common = (
        pre.join(post, "s")
        .filter((F.col("inner_id") != F.col("outer_id"))
                & (F.col("n_out") * t_den >= F.col("n_inner") * t_num))
        .withColumn("common", _mask_intersect("__ma", "__mb", n_words))
        .filter(F.col("common") * t_den >= F.col("n_inner") * t_num)
        .select("inner_id", "outer_id", "n_inner", "common")
        .distinct())
    return out_select(common)


variants = {"cur": mk_cur, "bcast": mk_bcast, "inline": mk_inline}
ref = {tuple(r) for r in mk_cur().collect()}
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
