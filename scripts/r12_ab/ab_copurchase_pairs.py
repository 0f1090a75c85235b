import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale
from realtime_data_warehouse_spark.sources.batch import load_table
from realtime_data_warehouse_spark.cache import unpersist_all
from pyspark.sql import functions as F
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()
li = load_table(spark, sf, "lineitem")

def old():
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    return (a.join(b, (F.col("a.l_orderkey")==F.col("b.l_orderkey")) & (F.col("a.l_partkey")<F.col("b.l_partkey")))
            .groupBy(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders")>=2)
            .orderBy(F.col("n_orders").desc(), "part_a", "part_b").limit(20))

def new():
    baskets = (li.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    pairs = baskets.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS part_a, y AS part_b))))"
    )).alias("pr")).select("pr.part_a", "pr.part_b")
    return (pairs.groupBy("part_a","part_b").agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders")>=2)
            .orderBy(F.col("n_orders").desc(), "part_a", "part_b").limit(20))

r_old = sorted(tuple(r) for r in old().collect())
r_new = sorted(tuple(r) for r in new().collect())
print("EQUAL" if r_old == r_new else f"DIFFER\n{r_old[:3]}\n{r_new[:3]}")
best = {"old": [], "new": []}
for i in range(5):
    for k, mk in (("old", old), ("new", new)):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best[k].append(round(time.perf_counter()-t0,3))
        unpersist_all()
for k, v in best.items(): print(f"{min(v):7.3f}  {k}  {v}")
