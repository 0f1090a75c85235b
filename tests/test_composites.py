"""Behavioral tests for the round-5 batch-5 composites (oracle
hash-parity is covered by test_oracle_parity for every entry; these
pin the SEMANTICS the hashes can't explain on their own)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_warehouse_spark.plans.registry import QUERIES


def test_streaks_invariants(spark, sf_small):
    rows = QUERIES["user_activity_streaks"](spark, sf_small).collect()
    assert rows, "no users"
    for r in rows:
        # islands partition the active-day set: lengths sum to the total
        assert r.longest_streak <= r.active_days
        assert r.n_streaks >= 1
        # n_streaks islands of >=1 day each cover all active days
        assert r.active_days >= r.n_streaks
        # pigeonhole: the longest island is at least the average
        assert r.longest_streak * r.n_streaks >= r.active_days


def test_streaks_match_python_fold(spark, sf_small):
    events = spark.read.parquet(f"{sf_small}/events.parquet")
    days = {
        (r.user_id, r.d)
        for r in events.select("user_id", F.to_date("ts").alias("d")).collect()
    }
    by_user: dict[int, list] = {}
    for uid, d in days:
        by_user.setdefault(uid, []).append(d)
    expect = {}
    for uid, ds in by_user.items():
        ds.sort()
        lens, run = [], 1
        for prev, cur in zip(ds, ds[1:]):
            if (cur - prev).days == 1:
                run += 1
            else:
                lens.append(run)
                run = 1
        lens.append(run)
        expect[uid] = (len(ds), len(lens), max(lens))
    got = {
        r.user_id: (r.active_days, r.n_streaks, r.longest_streak)
        for r in QUERIES["user_activity_streaks"](spark, sf_small).collect()
    }
    assert got == expect


def test_rrf_fusion_agrees_with_member_lists(spark, sf_small):
    rows = QUERIES["ann_rrf_fusion"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_lists in (1, 2)
        # score bounds: rank >= 1 in each list it appears in
        # rrf is rounded to 9 decimals, so allow half-ulp-of-round slack
        assert 0 < r.rrf <= r.n_lists / 61.0 + 5e-10
    # a doc in both lists at rank 1 would hit 2/61; top-1 per query
    # must outscore (or tie-break below) every other emitted doc
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        assert len(rs) <= 5
        assert all(x.rrf > 0 for x in rs)


def test_keep_best_quality_keeps_cluster_argmax(spark, sf_small):
    clusters = {
        r.doc_id: r.cluster
        for r in QUERIES["dedup_clusters"](spark, sf_small).collect()
    }
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "n_chars").collect()
    }
    by_cluster: dict[int, list] = {}
    for doc, cl in clusters.items():
        by_cluster.setdefault(cl, []).append(doc)
    out = QUERIES["dedup_keep_best_quality"](spark, sf_small).collect()
    assert {r.cluster for r in out} == set(by_cluster)
    for r in out:
        members = by_cluster[r.cluster]
        assert r.n_members == len(members)
        assert r.n_dropped == len(members) - 1
        best = min(members, key=lambda d: (-docs[d], d))
        assert r.kept_doc_id == best
        assert r.kept_n_chars == docs[best]


def test_winsorized_stats_invariants(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    totals = {r.l_returnflag: r.n for r in
              li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    out = QUERIES["winsorized_price_stats"](spark, sf_small).collect()
    assert {r.l_returnflag for r in out} == set(totals)
    for r in out:
        assert r.n == totals[r.l_returnflag]
        # p01/p99 clip: at most ~1% clipped on each side (ceil slack)
        assert r.clipped_low <= r.n // 100 + 1
        assert r.clipped_high <= r.n // 100 + 1
        assert r.sum_winsorized > 0


def test_label_noise_candidates_disagree_with_majority(spark, sf_small):
    rows = QUERIES["label_noise_candidates"](spark, sf_small).collect()
    for r in rows:
        assert r.label != r.majority_label
        assert r.bucket_size >= 5
        assert r.majority_frac >= 0.6 - 1e-9
    # every flagged vector's label must exist in the raw table
    emb = {r.vec_id: r.label for r in
           spark.read.parquet(f"{sf_small}/embeddings.parquet")
           .select("vec_id", "label").collect()}
    for r in rows:
        assert emb[r.vec_id] == r.label
