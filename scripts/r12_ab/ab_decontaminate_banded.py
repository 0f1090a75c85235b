import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import load_table, fan_out
from realtime_data_warehouse_spark.cache import unpersist_all, persisted
from realtime_data_warehouse_spark.operators import dedup as D
from pyspark.sql import functions as F
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
_BENCH = "doc_id % 13 = 0"
docs = fan_out(load_table(spark, sf, "documents"))
def old():
    post = persisted(D.gram_postings(docs))
    tp = post.filter(~F.expr(_BENCH)).select(F.col("doc_id").alias("train_id"), "s", "sz")
    bp = post.filter(F.expr(_BENCH)).select(F.col("doc_id").alias("bench_id"), "s", "sz")
    return D.fuzzy_set_join(None, None, "train_id", "bench_id", threshold=0.8,
                            left_postings=tp, right_postings=bp)
def new():
    sh = persisted(D.with_shingles(docs.select("doc_id","text"), "text", 2, drop_empty=True).select("doc_id","shingles"))
    train = sh.filter(~F.expr(_BENCH)).withColumnRenamed("doc_id","train_id")
    bench = sh.filter(F.expr(_BENCH)).withColumnRenamed("doc_id","bench_id")
    return D.minhash_lsh_join(train, bench, "train_id", "bench_id", 0.8)
best = {"old": [], "new": []}
for i in range(5):
    for k, mk in (("old", old), ("new", new)):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k].append(round(time.perf_counter()-t0,3))
        unpersist_all()
for k, v in best.items(): print(f"{min(v):7.3f}  {k}  {v}")
