"""Quantitative-statistics operators (round 5, batch 2).

Exact weighted quantiles, seasonality indices, and embedding
feature statistics — the numeric-profiling layer that sits beside
`profile_orders` / `anomaly_zscore_hourly`, plus the asymmetric
containment dedup the Jaccard family can't express. Shapes:

- weighted_median_price: weighted quantile via the price-level
  PRE-AGGREGATED cumulative sum — the window input is |distinct
  prices per group|, never the fact table. Groups here are the
  3-value returnflag domain, so each group is one sort task; for
  high-cardinality value domains the same plan holds, and for
  low-cardinality GROUPS with huge value domains the escape hatch
  is a fixed-bound histogram pass (revenue_histogram's shape) that
  brackets the median before an exact second pass.
- seasonal_dow_index: two nested tiny rollups (type×dow, then
  type) — the index join is 7 rows × |types|, broadcast.
- embedding_dim_stats: per-dimension mean/variance via posexplode
  long format. The ×dim row blowup is the documented exact-mode
  trade (embeddings are |docs|×dim values either way; the long form
  keeps sums decimal-exact so any engine reproduces them bit-for-
  bit). The fused mapInPandas partial-sum path
  (operators/similarity.kmeans_train) is the throughput variant
  when bit-stable cross-engine hashes aren't required.
- containment_pairs: |A∩B|/|A| ≥ t — catches doc-inside-doc
  duplication (quoting, scraping with boilerplate) that symmetric
  Jaccard misses. Prefix filter applies on the CONTAINED side only
  (pigeonhole: if |A∩B| ≥ t·|A|, B must hold one of A's
  ⌊(1−t)·|A|⌋+1 rarest shingles); the containing side indexes all
  its shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources.batch import fan_out, load_table
from .datapipe import _TOKS
from .registry import register


# ---------------------------------------------------------------------------
# Exact weighted median (quantity-weighted price)
# ---------------------------------------------------------------------------

@register(
    "weighted_median_price",
    oracle="""
    WITH pw AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS w
        FROM lineitem
        GROUP BY 1, 2
    ), cum AS (
        SELECT l_returnflag, price, w,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag)                AS tw
        FROM pw
    )
    SELECT l_returnflag,
           min(price)   AS weighted_median,
           CAST(any_value(tw) AS DOUBLE) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per returnflag: the
    smallest price whose cumulative weight reaches half the group
    total. The fact table first collapses to (group, price, weight)
    — weights summed decimal-exact — so the ordered cumulative pass
    runs over distinct prices only; weighted quantiles this way cost
    one pre-agg shuffle plus one bounded window sort, with no
    sort of raw facts anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    pw = (
        li.groupBy(F.col("l_returnflag"),
                   F.col("l_extendedprice").alias("price"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("w"))
    )
    part = Window.partitionBy("l_returnflag")
    cum = pw.withColumn(
        "cw", F.sum("w").over(part.orderBy("price"))
    ).withColumn("tw", F.sum("w").over(part))
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.any_value(F.col("tw")).cast("double").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality index
# ---------------------------------------------------------------------------

@register(
    "seasonal_dow_index",
    oracle="""
    WITH dow AS (
        SELECT event_type,
               CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        FROM events
        GROUP BY 1, 2
    ), tot AS (
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS n_all,
               CAST(sum(vsum) AS DOUBLE) AS vsum_all
        FROM dow GROUP BY 1
    )
    SELECT d.event_type, d.dow, d.n,
           round((d.vsum / d.n) / (t.vsum_all / t.n_all), 6) AS value_index,
           round((d.n * 7.0) / t.n_all, 6)                   AS volume_index
    FROM dow d JOIN tot t ON d.event_type = t.event_type
    """,
)
def seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: mean value and volume
    for each weekday relative to the type's overall mean — the
    decomposition a capacity planner reads before staffing for the
    weekly cycle. Both rollups are tiny (|types|×7 and |types|), so
    after the single map-side-combined groupBy everything is
    broadcast arithmetic; sums are decimal-exact so the index
    doubles agree across engines."""
    ev = load_table(spark, sf_dir, "events")
    dow = (
        ev.groupBy(
            "event_type",
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double").alias("vsum"),
        )
    )
    tot = dow.groupBy("event_type").agg(
        F.sum("n").alias("n_all"),
        F.sum(F.col("vsum").cast("decimal(18,2)")).cast("double")
        .alias("vsum_all"),
    )
    return (
        dow.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", "dow", "n",
            F.round((F.col("vsum") / F.col("n"))
                    / (F.col("vsum_all") / F.col("n_all")), 6)
            .alias("value_index"),
            F.round((F.col("n") * 7.0) / F.col("n_all"), 6)
            .alias("volume_index"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding per-dimension feature statistics
# ---------------------------------------------------------------------------

@register(
    "embedding_dim_stats",
    oracle="""
    SELECT i AS dim,
           count(*) AS n,
           round(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / count(*), 8)
               AS mean,
           round(CAST(sum(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) / count(*)
                 - pow(CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)
                       / count(*), 2), 8)
               AS variance
    FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY 1
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding column — the
    feature-health profile (dead dims, scale drift) run before any
    ANN index build. Long format: posexplode to (dim, x), one
    groupBy(dim) with decimal-exact power sums (the float widens to
    double losslessly; x and x·x round to DECIMAL(30,12) identically
    in any engine, making the variance bit-stable). dim cardinality
    is the model width, so the aggregate output is tiny however many
    vectors stream through the ×dim row expansion; the fused
    mapInPandas partial-sum kernel (kmeans_train's shape) is the
    throughput variant when cross-engine hashes aren't needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    long = emb.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select((F.col("pos") + 1).alias("dim"), x.alias("x"))
    s1 = F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
    s2 = F.sum((F.col("x") * F.col("x")).cast("decimal(30,12)")).cast("double")
    n = F.count(F.lit(1))
    return long.groupBy("dim").agg(
        n.alias("n"),
        F.round(s1 / n, 8).alias("mean"),
        F.round(s2 / n - F.pow(s1 / n, F.lit(2)), 8).alias("variance"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (doc-inside-doc)
# ---------------------------------------------------------------------------

_CONTAINMENT_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks)),
                                            i -> toks[i] || ' ' || toks[i+1])) AS sh
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE len(sh) > 0),
    pairs AS (
        SELECT a.doc_id AS inner_id, b.doc_id AS outer_id, count(*) AS common
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.inner_id, p.outer_id,
           CAST(CAST(p.common / CAST(sa.n AS DOUBLE) AS DECIMAL(6,4))
                AS DOUBLE) AS containment
    FROM pairs p
    JOIN (SELECT doc_id, len(sh) AS n FROM sh) sa ON p.inner_id = sa.doc_id
    WHERE p.common * 10 >= sa.n * 9
"""


@register("containment_pairs", oracle=_CONTAINMENT_SQL)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-inside-doc detection: (inner, outer) pairs where ≥ 90% of
    the inner doc's word-bigram shingles appear in the outer doc —
    the asymmetric duplication (quoting, boilerplate wrapping,
    scrape-with-chrome) that symmetric Jaccard dilutes away when the
    outer doc is much larger.

    Scale: prefix filtering applies on the INNER side only — if
    |A∩B| ≥ t·|A| then B holds one of A's ⌊(1−t)·|A|⌋+1 rarest
    shingles (pigeonhole), so the candidate join is A's rare-shingle
    prefix against the full inverted index, then one exact count per
    candidate pair verifies. Document frequency comes from the same
    inverted index (one extra tiny aggregate), and all exchanges key
    on shingle or doc id — uniform by construction."""
    # threshold 9/10 as a RATIONAL (integer arithmetic throughout):
    # float thresholds round differently across engines — DuckDB
    # parses 0.9 as exact DECIMAL while a double 0.9·10 lands at
    # 9.000000000000002 and ceils to 10, silently dropping boundary
    # pairs. operators/dedup.containment_join carries the predicate
    # as common·10 ≥ n·9 on both sides.
    docs = D.with_shingles(
        fan_out(load_table(spark, sf_dir, "documents")), drop_empty=True)
    return D.containment_join(docs, toks_col="shingles", t_num=9, t_den=10)
