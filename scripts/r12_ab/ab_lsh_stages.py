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
import pandas as pd
_noop = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10000, 1, 32).select(_noop("id")).write.format("noop").mode("overwrite").save()

docs = fan_out(load_table(spark, sf, "documents"))

def stage(name, mk, n=4):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        vals.append(round(time.perf_counter()-t0,3))
        unpersist_all()
    print(f"{min(vals):7.3f}  {name}  {vals}", flush=True)

# stage timings
stage("shingles_hof", lambda: D.with_shingles(docs.select("doc_id","text"), "text", 2, drop_empty=True).select("doc_id","shingles"))
def rel_shingles():
    return (D.gram_postings(docs.select("doc_id","text")).groupBy("doc_id")
            .agg(F.collect_list("s").alias("shingles")))
stage("shingles_rel", rel_shingles)
def band_only():
    sh = persisted(D.with_shingles(docs.select("doc_id","text"), "text", 2, drop_empty=True).select("doc_id","shingles"))
    return D.band_keys(sh, "doc_id")
stage("bands(sig UDF)", band_only)
stage("full_lsh_pairs", lambda: D.minhash_lsh_pairs(docs, threshold=0.8))
# variant: full chain but relational shingles
def lsh_rel():
    sh = persisted(rel_shingles())
    cands = D.lsh_candidates(docs, "doc_id", "text", 2, shingled=sh)
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    joined = cands.join(a_sh, "doc_a").join(b_sh, "doc_b")
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.size("sh_a") + F.size("sh_b") - common)
    return (joined.withColumn("jaccard", F.round(jac, 6)).filter(jac >= 0.8)
            .select("doc_a", "doc_b", "jaccard"))
stage("full_lsh_rel", lsh_rel)
