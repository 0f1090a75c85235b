"""Physical-plan audits — the scale discipline, encoded as tests.

A query that is correct at sf0.001 but plans a cartesian product, an
un-pushed filter, or a shuffle-everything join is wrong for the 100 TB
target; these tests pin the plan shape we want, so a refactor that
silently degrades the plan fails CI even though results still match.
"""

from __future__ import annotations

import pytest

from realtime_data_warehouse_spark.plans.registry import QUERIES
from realtime_data_warehouse_spark.sources.batch import load_table


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


#: brute-force ANN is all-pairs by definition; its BroadcastNestedLoop
#: (small query set broadcast, corpus streamed) is the correct plan.
#: ann_recall_report embeds that same brute pass as its ground truth.
ALL_PAIRS_BY_DESIGN = {
    "ann_brute_topk",     # labeled brute-force ANN ground truth
    "ann_recall_report",  # composes the brute retriever as truth
    "ann_rrf_fusion",     # fuses the brute retriever (exact list)
    "ann_lsh_recall",     # composes the brute retriever as truth
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(spark, sf_small, name):
    plan = physical_plan(QUERIES[name](spark, sf_small))
    if name in ALL_PAIRS_BY_DESIGN:
        return
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join (non-equi or missing join keys)"
    )


def test_pricing_summary_scan_pushdown(spark, sf_small):
    plan = physical_plan(QUERIES["pricing_summary"](spark, sf_small))
    # the shipdate predicate must reach the parquet scan...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ...and column pruning must drop fact columns the query never touches
    assert "l_partkey" not in plan.split("ReadSchema")[1]


def test_dim_joins_are_broadcast(spark, sf_small):
    for name in ("dws_sku_order_window", "local_supplier_volume", "dim_config_routing"):
        plan = physical_plan(QUERIES[name](spark, sf_small))
        assert "BroadcastHashJoin" in plan, f"{name}: dim join did not broadcast"
        assert "SortMergeJoin" not in plan or name == "local_supplier_volume", (
            f"{name}: unexpected sort-merge join at dim scale"
        )


def test_order_wide_join_shuffles_nothing(spark, sf_small):
    """The 4-way order-wide join chain must plan every hop as a
    broadcast hash join with ZERO shuffle exchanges — the measured
    SHUFFLE.md fact (1.95M rows scanned, 0 shuffled at sf0.1). A
    broadcast threshold regression or a new non-broadcastable hop
    would reintroduce a fact-table shuffle silently; pin it here."""
    for name in ("dwd_trade_order_detail", "dwd_trade_pay_suc_interval"):
        plan = physical_plan(QUERIES[name](spark, sf_small))
        assert "BroadcastHashJoin" in plan, f"{name}: join did not broadcast"
        assert "Exchange hashpartitioning" not in plan, (
            f"{name}: a join hop degraded to a shuffle exchange"
        )


def test_asof_join_is_not_a_range_join(spark, sf_small):
    """The as-of plan must be the union-scan (Window over one exchange),
    never an inequality join (nested-loop) between the two sides."""
    plan = physical_plan(QUERIES["asof_last_error"](spark, sf_small))
    assert "Window" in plan
    for marker in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan, f"asof planned {marker}"


def test_topk_orders_avoids_global_sort(spark, sf_small):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    top-k + single merge), not a full Exchange rangepartitioning sort."""
    plan = physical_plan(QUERIES["top100_orders"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_events_scan_prunes_columns(spark, sf_small):
    """A 2-column projection over events must not read all 6 columns."""
    df = load_table(spark, sf_small, "events").select("user_id", "event_type")
    schema_part = physical_plan(df).split("ReadSchema")[1]
    assert "props" not in schema_part and "value" not in schema_part


def test_bucketed_join_is_shuffle_free(spark, sf_small, tmp_path):
    """Co-located fact⋈fact: both sides bucketed on the join key must
    join with ZERO exchanges (the at-scale design claim for recurring
    big-big joins — pay the shuffle once at write time)."""
    from pyspark.sql import functions as F

    from realtime_data_warehouse_spark.sources.batch import load_table, write_bucketed

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale the optimizer would broadcast either side;
        # disable that so the plan shows what a fact⋈fact join does
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = physical_plan(joined)
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # and it still computes the right thing
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        want = {
            r["o_orderstatus"]: r["n"]
            for r in li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_route_read_prunes(spark, sf_small, tmp_path):
    """K2 routing writes partitioned by sink_table; reading ONE route
    must plan a partition-pruned scan (PartitionFilters), not a full
    scan plus filter — the reader-side half of topic-per-record."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "routed")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "sink_table string, v int"
    )
    df.write.partitionBy("sink_table").mode("overwrite").parquet(out)
    rd = spark.read.parquet(out).filter(F.col("sink_table") == "a")
    plan = physical_plan(rd)
    assert "PartitionFilters" in plan
    assert "isnotnull(sink_table" in plan or "sink_table" in plan.split("PartitionFilters")[1].split("]")[0]
    assert rd.count() == 2


def test_single_window_spec_plans_one_exchange(spark, sf_small):
    """running_revenue_by_customer: three analytic functions over one
    window spec must share a single exchange+sort, not stack three."""
    plan = physical_plan(QUERIES["running_revenue_by_customer"](spark, sf_small))
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1
    assert plan.count("Window") == 1


def test_aqe_splits_skewed_join(spark, tmp_path):
    """Skew discipline: a join with one pathological hot key must be
    handled by AQE's skew-join split (the runtime answer; salted_join
    is the static one, test_salted_join_matches_plain_join). Thresholds
    are lowered so the tiny fixture triggers the same OptimizeSkewedJoin
    rule a hot key triggers at 100 TB."""
    from pyspark.sql import functions as F

    left_dir = str(tmp_path / "l")
    right_dir = str(tmp_path / "r")
    # key 0 holds ~99% of the left side
    spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 == 0, F.col("id")).otherwise(F.lit(0)).alias("k"),
        F.col("id").alias("v"),
    ).write.mode("overwrite").parquet(left_dir)
    spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("w")) \
        .write.mode("overwrite").parquet(right_dir)

    prev = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
        "spark.sql.adaptive.coalescePartitions.enabled":
            spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # the join must be terminal: a downstream groupBy on the same
        # key would reuse the join's hash partitioning, and AQE then
        # declines the skew split (it would force an extra shuffle —
        # spark.sql.adaptive.forceOptimizeSkewedJoin is the override)
        joined = (
            spark.read.parquet(left_dir)
            .join(spark.read.parquet(right_dir), "k")
            .select(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        # execute THIS DataFrame's own QueryExecution (count() would
        # spawn a fresh one whose AQE plan we couldn't inspect)
        rows = joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, "AQE did not split the skewed partition"
        assert rows[0]["s"] is not None
    finally:
        for key, val in prev.items():
            spark.conf.set(key, val)


def test_curation_pipeline_has_no_join(spark, sf_small):
    """chunk_tokens(passthrough=...) carries split/lang into the chunk
    rows, so the pipeline must not plan ANY join (the old join-back to
    recover doc attributes was a whole extra shuffle at 100 TB)."""
    plan = physical_plan(QUERIES["curation_pipeline"](spark, sf_small))
    assert "Join" not in plan, "curation_pipeline re-grew a join"
    # exchanges: the fingerprint-dedup groupBy + the final aggregate's
    # count-distinct two-phase ((split,lang,doc_id) partial then
    # (split,lang)) — anything beyond those three is a regression (the
    # old join-back planned a fourth).
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_lsh_topk_plan_is_bucket_equi_join(spark, sf_small):
    """ann_lsh_topk must candidate-generate via a bucket equi-join
    (broadcast probes), never a cartesian — the entire point of the
    LSH scale path."""
    plan = physical_plan(QUERIES["ann_lsh_topk"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_embedding_normalize_is_map_side_only(spark, sf_small):
    """L2 normalization is scan → project → explode: any Exchange in
    this plan is a regression (a shuffle to normalize vectors would be
    pure waste at 100 TB)."""
    plan = physical_plan(QUERIES["embedding_normalize"](spark, sf_small))
    assert "Exchange" not in plan, plan


def test_pii_redaction_is_map_side_only(spark, sf_small):
    """The PII scrub is scan → project (regexp chains): any Exchange
    beyond the fan_out re-split is a regression — a shuffle to run a
    per-row scrub would be pure waste at 100 TB."""
    plan = physical_plan(QUERIES["pii_redaction"](spark, sf_small))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_tfidf_plan_shape(spark, sf_small):
    """tfidf: tf groupBy + term-partition window + doc-partition rank
    window — three hash exchanges, no join (corpus size is an inlined
    scalar)."""
    plan = physical_plan(QUERIES["tfidf_top_terms"](spark, sf_small))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 3, plan


def test_profile_orders_is_single_scan(spark, sf_small):
    """The profiler computes every column's stats in ONE aggregate
    over ONE scan (exact mode plans Expand for the multi-distinct);
    more than one file scan means it degraded to per-column passes."""
    plan = physical_plan(QUERIES["profile_orders"](spark, sf_small))
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan  # exact multi-distinct, documented trade


def test_incremental_refresh_merges_partials(spark, sf_small):
    """The merge stage must re-aggregate partial-aggregate rows, not
    re-join or rescan facts: two base scans (on-time + late slices;
    in production the base side is a stored table), no join."""
    plan = physical_plan(QUERIES["incremental_agg_refresh"](spark, sf_small))
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 2, plan


def test_hll_rollup_merge_equals_direct(spark, sf_small):
    """HLL register state is order-insensitive: the union of hourly
    sketches must estimate exactly what a single daily sketch over the
    raw rows does — the lossless-merge property that makes sketch
    rollups safe to serve."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_small, "events")
    merged = {
        r.cur_date: r.uv_estimate
        for r in QUERIES["hll_rollup_daily_uv"](spark, sf_small).collect()
    }
    direct = {
        r.cur_date: r.uv
        for r in events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("cur_date")
        ).agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("uv")).collect()
    }
    assert merged == direct


def test_funnel_is_single_scan_single_shuffle(spark, sf_small):
    """funnel_conversion: the three dependent stage windows and the
    per-user collapse must share ONE events scan and ONE user_id
    exchange — the 3-row stage table is exploded from the single
    aggregate row, never a self-union (which would triplicate the
    pipeline)."""
    plan = physical_plan(QUERIES["funnel_conversion"](spark, sf_small))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" not in plan


def test_anomaly_zscore_windows_over_rollup(spark, sf_small):
    """anomaly_zscore_hourly: the trailing-frame window must consume
    the hourly rollup (HashAggregate below Window), so the analytic
    pass never sorts raw events."""
    plan = physical_plan(QUERIES["anomaly_zscore_hourly"](spark, sf_small))
    assert plan.index("Window") < plan.index("FileScan")  # plan prints top-down
    # rollup aggregate sits between the scan and the window pass
    assert plan.index("HashAggregate") < plan.index("FileScan")
    assert plan.count("Window") == 1


def test_scd2_single_exchange(spark, sf_small):
    """scd2_dim_history: version closing is one lead() over the key
    partition — exactly one hash exchange, no join back."""
    plan = physical_plan(QUERIES["scd2_dim_history"](spark, sf_small))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_passage_dedup_two_shuffles_no_join(spark, sf_small):
    """passage_dedup_stats: corpus-wide passage counting is a window
    over the fingerprint partition plus the doc_id rollup — two hash
    exchanges, and no join of chunks back to documents."""
    plan = physical_plan(QUERIES["passage_dedup_stats"](spark, sf_small))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_pit_join_broadcasts_history(spark, sf_small):
    """scd2_point_in_time_join: the version history is a broadcast
    dim — facts must join via BroadcastHashJoin (interval predicate
    inside the equi-key join), never a sort-merge shuffle of facts."""
    plan = physical_plan(QUERIES["scd2_point_in_time_join"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_revenue_histogram_single_exchange(spark, sf_small):
    """revenue_histogram: map-side bucket expression + one bounded
    groupBy — exactly one exchange, no join, no window."""
    plan = physical_plan(QUERIES["revenue_histogram"](spark, sf_small))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


def test_gdpr_purge_is_broadcast_probe(spark, sf_small):
    """gdpr_forget_users: the tombstone list must broadcast — every
    fact-table probe is a map-side BroadcastHashJoin; a sort-merge
    join here would shuffle the 100 TB side on the subject key."""
    plan = physical_plan(QUERIES["gdpr_forget_users"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_audience_overlap_single_user_shuffle(spark, sf_small):
    """audience_overlap: one user_id exchange (flag aggregate), one
    single-row reduce — no join of segment lists, no distinct Expand."""
    plan = physical_plan(QUERIES["audience_overlap"](spark, sf_small))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Expand" not in plan


def test_quality_percentile_no_global_sort(spark, sf_small):
    """quality_percentile_by_lang: the rank window partitions by lang
    — the plan must contain NO single-partition exchange (a global
    NTILE would show Exchange SinglePartition under the Window)."""
    plan = physical_plan(QUERIES["quality_percentile_by_lang"](spark, sf_small))
    window_zone = plan[: plan.index("Window")] if "Window" in plan else ""
    assert "Exchange SinglePartition" not in window_zone
    assert plan.count("Window") == 1


def test_importance_sample_is_map_side_only(spark, sf_small):
    """importance_weighted_sample: keep/drop must be a pure map-side
    predicate — exactly one exchange (the tiny per-lang report), no
    join, no window, no second scan."""
    plan = physical_plan(QUERIES["importance_weighted_sample"](spark, sf_small))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


def test_snapshot_diff_is_one_join_no_second_pass(spark, sf_small):
    """snapshot_diff_cdc: one full-outer join with the changed-row
    filter applied on the join output — no re-aggregation, no union
    of per-op branches (which would re-scan per op type)."""
    plan = physical_plan(QUERIES["snapshot_diff_cdc"](spark, sf_small))
    assert plan.count("SortMergeJoin") == 1 and "FullOuter" in plan
    assert "Union" not in plan


def test_waiting_orders_single_fact_scan(spark, sf_small):
    """waiting_orders_by_supplier (Q21 shape): the EXISTS/NOT-EXISTS
    correlation must run as stacked windows over ONE evaluation of
    the joined fact — the naive rollup-self-join plans the lineitem
    scan twice (once per branch). Exactly one lineitem scan, no
    fact-side join beyond the orders join, supplier join broadcast."""
    plan = physical_plan(QUERIES["waiting_orders_by_supplier"](spark, sf_small))
    assert plan.count("lineitem.parquet") == 1, "fact subtree duplicated"
    assert "BroadcastHashJoin" in plan
    import re as _re
    # two fused window nodes: the (order,supplier)-level max+delegate
    # share one ordered spec; the per-order sums share the other
    assert len(_re.findall(r"\bWindow \[", plan)) == 2


def test_classics_correlated_rollups_broadcast_back(spark, sf_small):
    """Q2/Q17 shapes: the correlated-subquery rewrite joins a bounded
    rollup BACK into the detail side — that join-back must be a
    broadcast, never a re-shuffle of the detail side."""
    for name in ("min_cost_regional_supplier", "small_qty_order_revenue"):
        plan = physical_plan(QUERIES[name](spark, sf_small))
        assert "BroadcastHashJoin" in plan, f"{name}: rollup join-back not broadcast"
    # Q17's fact table must be scanned exactly twice (detail + rollup),
    # never three times (a triple scan would mean the filter re-derives
    # the rollup per arm).
    plan17 = physical_plan(QUERIES["small_qty_order_revenue"](spark, sf_small))
    assert plan17.count("lineitem.parquet") == 2


def test_top_supplier_quarter_pushdown_and_bounded_window(spark, sf_small):
    """Q15 shape: the quarter filter must reach the parquet scan, and
    the scalar-max window must run over the supplier rollup (AFTER the
    aggregate), not over raw facts."""
    plan = physical_plan(QUERIES["top_supplier_quarter"](spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    agg_pos = plan.index("HashAggregate")
    win_pos = plan.index("Window")
    assert win_pos < agg_pos or "Window" in plan[:agg_pos] or True  # see below
    # The window input must be the aggregated rollup: in executedPlan
    # the Window node sits ABOVE (earlier in the printed tree than)
    # the HashAggregate that produced total_revenue.
    assert plan.index("Window") < plan.index("HashAggregate")


def test_dormant_customers_no_nested_loop(spark, sf_small):
    """Q22 shape: the per-nation threshold join must be a broadcast
    equi-join and the no-recent-orders predicate a LEFT ANTI join —
    no BroadcastNestedLoopJoin (the scalar-subquery trap) anywhere."""
    plan = physical_plan(QUERIES["dormant_customers_audit"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_disjunctive_predicate_prunes_part_scan(spark, sf_small):
    """Q19 shape: the OR-of-conjuncts must push the derivable
    brand/size envelope into the PART scan (Or(...) in PushedFilters)
    rather than filtering only after the join."""
    plan = physical_plan(QUERIES["disjunctive_predicate_revenue"](spark, sf_small))
    part_scan = [seg for seg in plan.split("FileScan parquet")
                 if "part.parquet" in seg]
    assert part_scan and "Or(" in part_scan[0].split("ReadSchema")[0]


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_small):
    """100 TB path: when the dim side of a shuffle join carries a
    selective filter and is too big to broadcast, Spark must inject a
    runtime BLOOM FILTER built from the filtered dim keys into the
    fact-side scan (semi-join reduction — the fact rows that cannot
    match die before the shuffle). Local-scale sizes disqualify the
    rewrite by default, so the size thresholds are scaled down to
    let the optimizer face the decision; the assertion is on the
    PLAN, which is size-independent once eligible."""
    from pyspark.sql import functions as F

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold", "100MB")
        li = load_table(spark, sf_small, "lineitem")
        orders = load_table(spark, sf_small, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderpriority").count())
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, "runtime bloom filter not injected"
        # and the reduction must sit on the FACT side (filters lineitem)
        assert "bloom_filter_agg" in opt
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Decision-support batch 2 (plans/decision_support.py) plan pins
# ---------------------------------------------------------------------------

def test_returned_items_enriches_after_limit(spark, sf_small):
    """Q10 shape: the customer/nation dims must join the 20-row
    TakeOrdered result, never the fact — TakeOrderedAndProject must
    appear BELOW the broadcast joins in the plan tree (i.e. the
    limit's output feeds the joins), and there is no global sort."""
    plan = physical_plan(QUERIES["returned_items_report"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # a global range-partitioned sort of the rollup would betray a
    # sort-before-limit plan; the final 20-row orderBy collapses to a
    # single-partition sort at most
    assert plan.count("rangepartitioning") <= 1


def test_late_shipment_exists_costs_one_fact_shuffle(spark, sf_small):
    """Q4 shape: the correlated EXISTS must fuse into the orderkey
    rollup of the lineitem join — no second join of a distinct
    orderkey set back to orders, no extra Exchange beyond the join
    key and the 5-row priority rollup."""
    plan = physical_plan(QUERIES["late_shipment_priority_counts"](spark, sf_small))
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan
    # joins: exactly one (lineitem ⋈ orders); the EXISTS is a rollup,
    # not a semi-join back
    njoins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
    assert njoins == 1, f"expected 1 join, plan has {njoins}"


def test_nation_pair_dims_prune_before_fact_join(spark, sf_small):
    """Q7 shape: both nation-filtered dims broadcast; the only
    non-broadcast join key permitted is the lineitem⋈orders orderkey
    exchange."""
    plan = physical_plan(QUERIES["nation_pair_trade_volume"](spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_market_share_single_rollup(spark, sf_small):
    """Q8 shape: numerator and denominator come from ONE aggregate —
    no revenue-CTE self-join (≤1 sort-merge join: the orderkey
    exchange), and no BroadcastNestedLoopJoin from a scalar
    subquery."""
    plan = physical_plan(QUERIES["market_share_by_year"](spark, sf_small))
    assert plan.count("SortMergeJoin") <= 1
    assert "BroadcastNestedLoopJoin" not in plan
    # one HashAggregate pair (partial+final) for the year rollup; a
    # second aggregation subtree would betray a numerator re-scan
    assert plan.count("HashAggregate") <= 2


def test_copurchase_self_join_is_keyed(spark, sf_small):
    """Market-basket shape: the within-order pair expansion must be
    an equi-join on l_orderkey (bounded group size), never an
    inequality-only nested loop."""
    plan = physical_plan(QUERIES["copurchase_part_pairs"](spark, sf_small))
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan
    assert "TakeOrderedAndProject" in plan


def test_trend_fit_runs_on_rollup_only(spark, sf_small):
    """Closed-form OLS: the regression arithmetic must consume the
    (year, day) rollup — two aggregate pairs total (daily rollup +
    power sums), zero joins, zero windows over the fact."""
    plan = physical_plan(QUERIES["trend_fit_daily_revenue"](spark, sf_small))
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "Window",
                   "CartesianProduct"):
        assert marker not in plan, f"unexpected {marker}"


# ---------------------------------------------------------------------------
# Rollup/reshape surface (plans/rollups.py) plan pins
# ---------------------------------------------------------------------------

def test_grouping_sets_expand_after_reduce(spark, sf_small):
    """The grouping-sets lattice must multiply the pre-reduced
    (year, status) rollup, not the orders scan: the Expand node sits
    ABOVE the first aggregate pair in the tree (fact → partial+final
    agg → Expand → re-agg), so exactly one Expand and two aggregate
    pairs appear."""
    plan = physical_plan(QUERIES["grouping_sets_revenue"](spark, sf_small))
    assert plan.count("Expand") == 1
    # 4 HashAggregate nodes = (partial, final) × (base rollup, lattice)
    assert plan.count("HashAggregate") == 4
    # tree prints top-down: the final lattice aggregate precedes
    # Expand, which precedes the base-rollup aggregate of the scan
    assert plan.index("Expand") < plan.rindex("HashAggregate")


def test_unpivot_melts_rollup_not_fact(spark, sf_small):
    """The melt's Expand must consume the |nations|-row aggregate —
    Expand above the aggregate pair, broadcast dim join below it."""
    plan = physical_plan(QUERIES["unpivot_nation_metrics"](spark, sf_small))
    assert plan.count("Expand") == 1
    assert "BroadcastHashJoin" in plan
    assert plan.index("Expand") < plan.index("BroadcastHashJoin")


def test_rolling_distinct_fans_out_rollup_only(spark, sf_small):
    """The 7-day fanout must explode the DISTINCT (user, day) rollup:
    Generate (explode) sits above at least one aggregate (the
    distinct), and the observed-days clip is a broadcast semi-join,
    never a range join."""
    plan = physical_plan(QUERIES["rolling_7d_distinct_users"](spark, sf_small))
    assert "Generate explode" in plan
    assert plan.index("Generate explode") < plan.rindex("HashAggregate")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    for marker in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert marker not in plan


def test_sample_k_engages_window_group_limit(spark, sf_small):
    """rank ≤ k must plan WindowGroupLimit: map tasks pre-prune to
    their local top-k per group before the sort exchange — for both
    the uniform and the Efraimidis–Spirakis weighted sampler."""
    for name in ("sample_k_per_lang", "weighted_sample_per_source"):
        plan = physical_plan(QUERIES[name](spark, sf_small))
        assert "WindowGroupLimit" in plan, f"{name} missing WindowGroupLimit"



def test_forecast_revenue_pure_pushdown(spark, sf_small):
    """Q6 shape: all predicates reach the scan; zero joins; the plan
    is scan → partial agg → single-row exchange."""
    plan = physical_plan(QUERIES["forecast_revenue_change"](spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") == 2


def test_cohort_ltv_window_over_grid_only(spark, sf_small):
    """The cumulative window must consume the (cohort, offset) grid:
    Window above the aggregate pair, signup rollup broadcast below."""
    plan = physical_plan(QUERIES["cohort_ltv_curve"](spark, sf_small))
    assert plan.count("Window") == 1
    assert "BroadcastHashJoin" in plan
    assert plan.index("Window") < plan.rindex("HashAggregate")


def test_bigram_lm_is_pure_expressions(spark, sf_small):
    """The LM chain must stay JVM-side: no python UDFs (no
    BatchEvalPython / ArrowEvalPython), joins are equi-joins."""
    plan = physical_plan(QUERIES["bigram_lm_score"](spark, sf_small))
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"unexpected {marker}"
