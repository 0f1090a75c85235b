import os, sys, time
sys.path.insert(0, '/root/repo')
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale, use_rocksdb_state
from realtime_data_warehouse_spark.cache import unpersist_all
from realtime_data_warehouse_spark.plans.registry import QUERIES
from realtime_data_warehouse_spark.streaming import runner as R
spark = get_spark("exp"); tune_for_scale(spark)
sf = "/root/testdata/sf0.1"
q = QUERIES["stream_order_wide_join"]
q(spark, sf).write.format("noop").mode("overwrite").save(); unpersist_all()
TRACK = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"

def run(label, track):
    use_rocksdb_state(spark, True)
    spark.conf.set(TRACK, "true" if track else "false")
    R.RECENT_DRAINS.clear()
    t0 = time.perf_counter()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    el = time.perf_counter() - t0
    unpersist_all()
    durs = sorted(float(p["durationMs"]["triggerExecution"]) for d in R.RECENT_DRAINS for p in d
                  if p.get("durationMs", {}).get("triggerExecution") is not None)
    p50 = durs[len(durs)//2] if durs else -1
    frac = sum(x <= 5000 for x in durs)/len(durs) if durs else -1
    print(f"{label}: drain={el:.1f}s p50={p50} within5s={frac:.2f}", flush=True)
    spark.conf.unset(TRACK); use_rocksdb_state(spark, False)

for i in range(3):
    run("rocks track=on ", True)
    run("rocks track=off", False)
