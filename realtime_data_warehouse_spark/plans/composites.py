"""Composed policy / fusion layers (round 5 batch 5).

Each entry composes existing kernels into a capability users run as
one query: gaps-and-islands streak analysis (the warehouse-classic
consecutive-activity shape), reciprocal-rank fusion of two ANN
retrievers (the standard hybrid-retrieval merge), the
keep-best-quality near-dup policy (cluster, then keep the best
member — the curation policy real LLM pipelines apply where
keep-first would discard the superset copy), winsorized robust
statistics (exact discrete p01/p99 clipping without a global sort),
and LSH-bucket label-noise detection (the mislabel QA pass run
before training on labeled data).

Appended last in plans/registry.py so every earlier round's driver
gate prefix is untouched (append-only registry discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import curation as C
from ..operators import dedup as D
from ..operators import similarity as S
from ..sources.batch import fan_out, load_table
from .curation import _lp_round
from .datapipe import _JACCARD_PAIRS_SQL
from .registry import register


# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------

@register(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    islands AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', d)
                 - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
        FROM days
    ),
    streaks AS (
        SELECT user_id, g, count(*) AS len FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streaks via the
    gaps-and-islands rewrite: distinct (user, day) → island key =
    day_number − row_number (constant within a consecutive run) →
    per-island lengths → per-user rollup. Two exchanges total, both
    keyed on user_id (the distinct's (user, day) hash co-locates the
    window's user partitions), and every post-distinct row count is
    bounded by users×days — the events table itself is reduced in the
    first aggregate. All arithmetic is integer day counts: exact in
    both engines, no epoch/float boundary risk."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "g",
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
        - F.row_number().over(w),
    )
    streaks = islands.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of two ANN strategies
# ---------------------------------------------------------------------------

# Candidate lists ranked exactly as the registered ann_* entries are:
# cosine over DOUBLE-cast embeddings, deterministic neighbor-id
# tie-break. BOTH the rank assignment AND the top-10 candidate-set
# cut use the ROUNDED cosine (QUALIFY orders by cos6 — round-6
# advice): a sub-round(6) ulp difference between engines at the k
# boundary can otherwise select different member SETS, and fusion
# compounds that across two lists. The Spark side passes
# rank_rounded=True for the same convention.
_RRF_LIST_SQL = """
    SELECT query_id, neighbor_id,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id
           ) AS rk
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_inner_product(q.e, c.e)
                     / sqrt(list_inner_product(q.e, q.e)
                            * list_inner_product(c.e, c.e)), 6) AS cos6
        FROM v q JOIN v c ON c.vec_id <> q.vec_id {cond}
        WHERE q.vec_id < 10
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id ORDER BY cos6 DESC, c.vec_id
        ) <= 10
    )
"""

_LSH_BUCKET_SQL = """
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               (CASE WHEN embedding[1]  >= 0 THEN 1   ELSE 0 END
              + CASE WHEN embedding[9]  >= 0 THEN 2   ELSE 0 END
              + CASE WHEN embedding[17] >= 0 THEN 4   ELSE 0 END
              + CASE WHEN embedding[25] >= 0 THEN 8   ELSE 0 END
              + CASE WHEN embedding[33] >= 0 THEN 16  ELSE 0 END
              + CASE WHEN embedding[41] >= 0 THEN 32  ELSE 0 END
              + CASE WHEN embedding[49] >= 0 THEN 64  ELSE 0 END
              + CASE WHEN embedding[57] >= 0 THEN 128 ELSE 0 END) AS bucket
        FROM embeddings
"""


@register(
    "ann_rrf_fusion",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    vb AS ({_LSH_BUCKET_SQL}),
    brute AS ({_RRF_LIST_SQL.format(cond="")}),
    lsh AS ({_RRF_LIST_SQL.format(cond="AND c.bucket = q.bucket")
            .replace("FROM v q JOIN v c", "FROM vb q JOIN vb c")}),
    contrib AS (
        SELECT query_id, neighbor_id, 1.0 / (60 + rk) AS c FROM brute
        UNION ALL
        SELECT query_id, neighbor_id, 1.0 / (60 + rk) AS c FROM lsh
    ),
    fused AS (
        SELECT query_id, neighbor_id,
               CAST(count(*) AS BIGINT) AS n_lists,
               sum(c) AS rrf_raw
        FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, n_lists, round(rrf_raw, 9) AS rrf
    FROM fused
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_raw DESC, neighbor_id
    ) <= 5
    """,
)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k₀=60) of the exact
    brute-force retriever and the sign-LSH bucketed retriever —
    score(q,d) = Σ_lists 1/(60 + rank). The standard way production
    search merges heterogeneous retrievers (lexical+vector,
    exact+approximate) without calibrating their score scales.

    Hash-stability: ranks are small integers, 1.0/(60+rk) is a single
    correctly-rounded IEEE division, and each fused score sums at
    most two such doubles — bit-identical in any engine, no libm.

    Scale: each list is k-bounded per query (the candidate
    generation itself is the registered ANN plans' cell/bucket
    equi-joins); fusion is a groupBy on (query, doc) over 2k rows per
    query — negligible next to retrieval, and embarrassingly
    partitionable by query id."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    rk_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    contrib = None
    for lst in (
        S.brute_force_topk(emb, queries, k=10, rank_rounded=True),
        S.lsh_topk(emb, queries, k=10, rank_rounded=True),
    ):
        c = lst.select(
            "query_id", "neighbor_id",
            (F.lit(1.0) / (F.lit(60) + F.row_number().over(rk_w)))
            .alias("c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("query_id", "neighbor_id").agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum("c").alias("rrf_raw"),
    )
    top_w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_raw").desc(), "neighbor_id"
    )
    return (
        fused.withColumn("__rk", F.row_number().over(top_w))
        .filter(F.col("__rk") <= 5)
        .select("query_id", "neighbor_id", "n_lists",
                F.round("rrf_raw", 9).alias("rrf"))
    )


# ---------------------------------------------------------------------------
# Keep-best-quality dedup policy: cluster, then keep the best member
# ---------------------------------------------------------------------------

@register(
    "dedup_keep_best_quality",
    # Same unrolled 3-round label propagation as dedup_clusters (the
    # replayable contract), then the keep-BEST policy per cluster:
    # argmax n_chars, doc_id tie-break.
    oracle=f"""
    WITH pr AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL})),
    edges AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pr
        UNION ALL
        SELECT doc_b, doc_a FROM pr
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS v, u AS l FROM edges),
    {_lp_round(1, 'l0')},
    {_lp_round(2, 'l1')},
    {_lp_round(3, 'l2')},
    ranked AS (
        SELECT l3.l AS cluster, d.doc_id, d.n_chars,
               row_number() OVER (
                   PARTITION BY l3.l
                   ORDER BY d.n_chars DESC, d.doc_id
               ) AS rk
        FROM l3 JOIN documents d ON d.doc_id = l3.v
    )
    SELECT CAST(cluster AS BIGINT)                        AS cluster,
           CAST(count(*) AS BIGINT)                       AS n_members,
           CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT)
                                                          AS kept_doc_id,
           CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
                                                          AS kept_n_chars,
           CAST(count(*) - 1 AS BIGINT)                   AS n_dropped
    FROM ranked GROUP BY cluster
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup policy real curation pipelines want where keep-first
    is wrong: cluster the ≥0.8-Jaccard pair graph (min-label
    propagation, replayable 3-round contract shared with
    dedup_clusters), then within each cluster keep the BEST member —
    argmax document length (the superset copy), doc-id tie-break —
    and report what each cluster kept vs dropped.

    Scale: labels come from the bounded-round equi-join kernel; the
    policy layer is one window over the cluster partition (cluster
    cardinality ≈ near-dup groups, small by construction) and a
    grouped reduce. Quality here is n_chars; any scoring column
    (model quality score, perplexity) drops in unchanged."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    labels = C.min_label_propagation(pairs, rounds=3)
    members = labels.join(
        docs.select("doc_id", "n_chars"),
        labels["id"] == F.col("doc_id"),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("kept_doc_id"),
        F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias("kept_n_chars"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Robust statistics: winsorized (p01/p99-clipped) per-group metrics
# ---------------------------------------------------------------------------

@register(
    "winsorized_price_stats",
    # The quantile rank is stated with INTEGER arithmetic on both
    # sides — ceil(n/100) = (n+99)//100, ceil(99n/100) = (99n+99)//100
    # — so no engine's double multiply (0.01*n can land a ulp above
    # the exact product and flip the ceil) decides a threshold.
    oracle="""
    WITH counts AS (
        SELECT l_returnflag AS g, l_extendedprice AS x, count(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        SELECT g, x,
               sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
               sum(c) OVER (PARTITION BY g) AS n
        FROM counts
    ),
    th AS (
        SELECT g,
               min(CASE WHEN cum >= (n + 99) // 100 THEN x END)      AS lo,
               min(CASE WHEN cum >= (99 * n + 99) // 100 THEN x END) AS hi
        FROM cum GROUP BY g
    )
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(greatest(t.lo, least(t.hi, l.l_extendedprice))
                         AS DECIMAL(18,2))) AS DOUBLE)   AS sum_winsorized,
           CAST(SUM(CASE WHEN l.l_extendedprice < t.lo THEN 1 ELSE 0 END)
                AS BIGINT)                                AS clipped_low,
           CAST(SUM(CASE WHEN l.l_extendedprice > t.hi THEN 1 ELSE 0 END)
                AS BIGINT)                                AS clipped_high
    FROM lineitem l JOIN th t ON l.l_returnflag = t.g
    GROUP BY 1
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics via winsorization: clip
    l_extendedprice at the group's exact discrete p01/p99, then
    aggregate — the outlier-hardening step metric pipelines apply
    before training on heavy-tailed columns.

    Plan: per-(group, value) pre-aggregate first (the shuffle carries
    distinct values, not rows), cumulative-count window per group
    locates both thresholds in one pass, the |groups|-row threshold
    table broadcasts back, and the clip is a map-side expression
    inside the final aggregate. No global sort, no per-row rank. For
    value domains too large even pre-aggregated, swap the threshold
    stage for operators/agg.two_pass_exact_quantile (same rank
    convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("x"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("g").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("g")
    cum = counts.select(
        "g", "x",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    lo_rank = F.expr("(n + 99) div 100")
    hi_rank = F.expr("(99 * n + 99) div 100")
    th = cum.groupBy("g").agg(
        F.min(F.when(F.col("cum") >= lo_rank, F.col("x"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("x"))).alias("hi"),
    )
    joined = li.join(
        F.broadcast(th), li["l_returnflag"] == th["g"]
    )
    clipped = F.greatest(
        F.col("lo"), F.least(F.col("hi"), F.col("l_extendedprice"))
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(clipped.cast("decimal(18,2)")).cast("double")
        .alias("sum_winsorized"),
        F.sum(F.when(F.col("l_extendedprice") < F.col("lo"), 1)
              .otherwise(0)).alias("clipped_low"),
        F.sum(F.when(F.col("l_extendedprice") > F.col("hi"), 1)
              .otherwise(0)).alias("clipped_high"),
    )


# ---------------------------------------------------------------------------
# Label-noise detection: LSH-bucket majority disagreement
# ---------------------------------------------------------------------------

@register(
    "label_noise_candidates",
    oracle=f"""
    WITH vb AS ({_LSH_BUCKET_SQL}),
    lab AS (SELECT v.vec_id, v.bucket, e.label
            FROM vb v JOIN embeddings e USING (vec_id)),
    counts AS (
        SELECT bucket, label, count(*) AS c
        FROM lab GROUP BY 1, 2
    ),
    maj AS (
        SELECT bucket, label AS majority_label, c AS maj_c,
               sum(c) OVER (PARTITION BY bucket) AS total
        FROM counts
        QUALIFY row_number() OVER (
            PARTITION BY bucket ORDER BY c DESC, label
        ) = 1
    )
    SELECT l.vec_id, l.label, l.bucket, m.majority_label,
           CAST(m.total AS BIGINT) AS bucket_size,
           round(m.maj_c / CAST(m.total AS DOUBLE), 6) AS majority_frac
    FROM lab l JOIN maj m USING (bucket)
    WHERE l.label <> m.majority_label
      AND m.total >= 5
      AND m.maj_c * 5 >= m.total * 3
    """,
)
def label_noise_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel detection — the dataset-QA pass run before training on
    labeled embeddings: inside each sign-LSH bucket (geometrically
    close vectors), flag members whose label disagrees with the
    bucket's majority label, when the bucket is big enough (≥5) and
    decisive enough (majority ≥ 60%, stated as maj·5 ≥ total·3 in
    integer arithmetic). Same confidence idea as "Confident Learning"
    pruning, computed purely relationally.

    Scale: bucket assignment is one map-side sign expression
    (float→double widening is exact, so the sign — and the bucket —
    is bit-identical in any engine); counts shuffle on (bucket, label);
    the majority table is |buckets| rows, broadcast back. Bucket
    width (8 bits here) tunes the geometry/recall trade exactly like
    ann_lsh_topk, whose hash family this shares."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    # Bucket expression comes from the ONE shared hash-family source
    # (operators/similarity.lsh_sign_bucket) so a bits/stride/sign
    # change there cannot silently desynchronize this plan from
    # ann_lsh_topk or from the oracle's unrolled form (round-5 advice).
    lab = emb.select(
        "vec_id", "label",
        S.lsh_sign_bucket(F.col("embedding")).alias("bucket"),
    )
    counts = lab.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).alias("c"))
    wtot = Window.partitionBy("bucket")
    wrk = Window.partitionBy("bucket").orderBy(
        F.col("c").desc(), "label")
    maj = (
        counts.select(
            "bucket",
            F.col("label").alias("majority_label"),
            F.col("c").alias("maj_c"),
            F.sum("c").over(wtot).alias("total"),
            F.row_number().over(wrk).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return (
        lab.join(F.broadcast(maj), "bucket")
        .filter(
            (F.col("label") != F.col("majority_label"))
            & (F.col("total") >= 5)
            & (F.col("maj_c") * 5 >= F.col("total") * 3)
        )
        .select(
            "vec_id", "label", "bucket", "majority_label",
            F.col("total").alias("bucket_size"),
            F.round(F.col("maj_c") / F.col("total").cast("double"), 6)
            .alias("majority_frac"),
        )
    )
