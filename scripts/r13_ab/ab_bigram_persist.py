"""Adjudicate bigram_lm_score's r12 tracked persists (VERDICT r12
item 2 / What's-wrong #2): the r12 builder's table says 1.93→1.54 s
but the committed BENCH_FULL read 1.93→2.16. Interleaved same-session
A/B (min-of-5, alternating): persist variant (current code) vs the
r11 no-persist form (4 corpus tokenizations). Also prints storage
level fractions so a spilling persist would be visible.
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from realtime_data_warehouse_spark.cache import persisted, unpersist_all
from realtime_data_warehouse_spark.functions.tokenize import tokenize
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import fan_out, load_table

from pyspark.sql import functions as F

spark = get_spark("ab-bigram")
tune_for_scale(spark)
sf = "/root/testdata/sf0.1"

import pandas as pd  # noqa: F401

_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode(
    "overwrite").save()
spark.read.parquet(os.path.join(sf, "region.parquet")).count()


def build(with_persist: bool):
    docs = fan_out(load_table(spark, sf, "documents"))
    toked = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    bi = (
        toked.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + 1).alias("w2"),
                ),
            )).alias("g"),
        )
        .select("doc_id", "g.w1", "g.w2")
    )
    uni = (toked.select(F.explode("toks").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    if with_persist:
        bi, uni = persisted(bi), persisted(uni)
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_vocab = uni.count()
    scored = (
        bi.join(big, ["w1", "w2"])
        .join(uni, bi["w1"] == uni["w"])
        .select("doc_id",
                F.expr(f"(c12 + 1) * 1000000 div (c1 + {n_vocab})")
                .alias("p_e6"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum("p_e6").alias("p_e6_sum"))
        .select("doc_id", "n_bigrams", "p_e6_sum",
                (F.expr("(2 * p_e6_sum + n_bigrams) div (2 * n_bigrams)")
                 .cast("double") / 1000000.0).alias("avg_prob"))
        .orderBy("doc_id")
    )


variants = {"persist": lambda: build(True), "noprst": lambda: build(False)}
best = {k: [] for k in variants}
for i in range(5):
    for k, mk in variants.items():
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        best[k].append(el)
        if k == "persist" and i == 0:
            # visible spill check: any block not fully in memory?
            sc = spark.sparkContext
            st = sc._jsc.sc().getExecutorMemoryStatus()
            print(f"  executor mem status: {st}", flush=True)
        unpersist_all()
for k, v in best.items():
    print(f"{k}: min={min(v):7.3f}  {v}", flush=True)
