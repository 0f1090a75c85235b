"""Relational rollup/reshape surface, round 4 continuation.

The reference's DWS layer materializes per-window rollups
(`DwsTradeSkuOrderWindow.java` etc.); this module adds the remaining
rollup/reshape primitives an analyst points at those tables —
multi-set GROUPING SETS, wide→long unpivot, trailing-window distinct
counts, and deterministic per-group sampling — each planned for
100 TB:

- grouping_sets_revenue: one Expand×|sets| pass over the PRE-REDUCED
  (year, status) rollup — the fact is aggregated once, the grouping
  sets multiply only the tiny rollup (same Expand-after-reduce
  discipline as `extras.rollup_revenue` / `extras.cube_revenue`).
- unpivot_nation_metrics: wide→long melt of a |nations|-row
  aggregate — the unpivot Expand runs over 25 rows, never the fact.
- rolling_7d_distinct_users: trailing-7-day exact distinct actives
  per day. The fanout explodes the DISTINCT (user, day) rollup
  (bounded: 7×|user-days|), never the raw event stream, then one
  distinct count per target day — no per-day window scans, no
  O(days × facts) self-join.
- sample_k_per_lang: deterministic k-per-group sample ranked by
  md5(doc_id) — re-derivable on any engine (the same discipline as
  `governance.importance_weighted_sample`). row_number ≤ k engages
  Spark's WindowGroupLimit rewrite: each map task pre-prunes to its
  local top-k per group BEFORE the sort exchange, so the shuffle
  carries ≤ k·|groups|·|tasks| rows, not the table (plan-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register


# ---------------------------------------------------------------------------
# GROUPING SETS over the pre-reduced rollup
# ---------------------------------------------------------------------------

@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           o_orderstatus AS status,
           CAST(2 * GROUPING(year(o_orderdate))
                + GROUPING(o_orderstatus) AS INT) AS gid,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
                            (year(o_orderdate)), (o_orderstatus), ())
    ORDER BY gid, order_year, status
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by explicit GROUPING SETS — the general form of which
    `rollup_revenue`/`cube_revenue` are the fixed lattices. Scale
    plan: the fact reduces FIRST to the (year, status) rollup in one
    map-side-combined exchange; the Expand×4 and the grouping-sets
    re-aggregation then run over ≤ |years|·|statuses| rows (decimal
    sums and counts are monoids, so re-summing partials is exact) —
    the lattice never multiplies the scan. gid (2·grouping(year) +
    grouping(status)) disambiguates 'grouped out' from a genuine
    NULL on every engine."""
    o = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate").cast("int").alias("order_year")
    status = F.col("o_orderstatus").alias("status")
    base = (
        o.select(year, status, "o_totalprice")
        .groupBy("order_year", "status")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .alias("rev_partial"),
            F.count(F.lit(1)).alias("n_partial"),
        )
    )
    gid = (2 * F.grouping("order_year")
           + F.grouping("status")).cast("int").alias("gid")
    return (
        base.groupingSets(
            [["order_year", "status"], ["order_year"], ["status"], []],
            "order_year", "status",
        )
        .agg(
            gid,
            F.sum("rev_partial").cast("double").alias("revenue"),
            F.sum("n_partial").alias("n_orders"),
        )
        .select("order_year", "status", "gid", "revenue", "n_orders")
        .orderBy("gid", "order_year", "status")
    )


# ---------------------------------------------------------------------------
# Wide → long unpivot of a bounded aggregate
# ---------------------------------------------------------------------------

@register(
    "unpivot_nation_metrics",
    oracle="""
    WITH m AS (
        SELECT n.n_name,
               CAST(COUNT(*) AS DOUBLE) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_acctbal,
               CAST(SUM(CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS n_negative
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    )
    SELECT n_name, metric, value FROM m
    UNPIVOT (value FOR metric IN (n_customers, total_acctbal,
                                  n_negative))
    ORDER BY n_name, metric
    """,
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse of `pivot_status_by_year`): a
    per-nation metric block unpivoted to (nation, metric, value)
    rows for generic downstream consumers. Scale plan: the melt's
    Expand×3 runs over the |nations|-row aggregate — the customer
    scan is reduced FIRST (map-side combine on the broadcast-joined
    nation key), so reshape cost is O(25·metrics), independent of
    table size."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    wide = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").alias("total_acctbal"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
            .cast("double").alias("n_negative"),
        )
    )
    return (
        wide.unpivot(
            ["n_name"],
            ["n_customers", "total_acctbal", "n_negative"],
            "metric", "value",
        )
        .orderBy("n_name", "metric")
    )


# ---------------------------------------------------------------------------
# Trailing-7-day exact distinct actives
# ---------------------------------------------------------------------------

@register(
    "rolling_7d_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS u7
    FROM days
    JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
    GROUP BY 1
    ORDER BY 1
    """,
)
def rolling_7d_distinct_users(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Trailing-7-day exact distinct active users per day — the WAU
    curve next to A7's daily UV (reference
    DwsUserUserLoginWindow.java counts uuCt per window; this is the
    overlapping-window generalization COUNT DISTINCT can't express
    per-window). Scale plan: dedupe to DISTINCT (user, day) FIRST
    (one exchange over the rollup key), then each user-day fans out
    to the ≤ 7 target days it contributes to — a constant-factor
    explode of the ROLLUP, not the event stream — and one distinct
    count per target day finishes it. The observed-days dim
    (≤ |calendar| rows) broadcasts to clip the fanout horizon; no
    per-day re-scan, no days×facts range join."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    days = ud.select("d").distinct()
    fanned = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6)))
        .alias("day"),
    )
    return (
        fanned.join(F.broadcast(days),
                    fanned["day"] == days["d"], "left_semi")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("u7"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Deterministic k-per-group sample
# ---------------------------------------------------------------------------

@register(
    "sample_k_per_lang",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, lang, source, n_chars, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY lang, rk
    """,
)
def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k sample per language: rank docs by
    md5(doc_id) within each lang and keep the first 5 — the
    eyeball-QA / few-shot-pick primitive. Unlike the Bernoulli
    `stratified_sample_langs` (fractional, size varies), this
    guarantees exactly k rows per group, and the hash ranking makes
    the pick re-derivable on any engine with no RNG state. Scale
    plan: rank ≤ k engages Spark's WindowGroupLimit rewrite
    (plan-pinned) — every map task pre-prunes to its LOCAL top-5 per
    lang before the sort exchange, so the shuffle moves
    ≤ 5·|langs|·|tasks| rows, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "lang", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis exp-sort)
# ---------------------------------------------------------------------------

@register(
    "weighted_sample_per_source",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               round(-ln(((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                                AS BIGINT) % 9007199254740992) + 0.5)
                         / 9007199254740992.0), 6)
               / n_chars AS es_key
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY es_key, doc_id
               ) AS rk
        FROM keyed
    )
    SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY source, rk
    """,
)
def weighted_sample_per_source(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=3 per source, weight
    ∝ n_chars — the Efraimidis–Spirakis exponential-sort scheme
    (key = −ln(u)/w, keep the k smallest), the standard one-pass
    distributed algorithm for 'pick k docs per corpus biased by
    length'. u is an md5-derived uniform in (0,1) (hash the doc_id,
    take 52 bits, add ½ then normalize — never exactly 0, so the log
    is finite), which makes the draw deterministic and re-derivable
    on any engine — same discipline as
    `governance.importance_weighted_sample`, upgraded from Bernoulli
    keep/drop to exact-k without replacement. Scale plan: the rank
    ≤ k filter engages WindowGroupLimit (map-local top-3 per source
    before the sort exchange, plan-pinned with sample_k_per_lang).

    Cross-engine ordering discipline: ln is transcendental and NOT
    IEEE correctly-rounded, so JVM Math.log and libm can disagree in
    the last ulp and flip a near-tie rank boundary. −ln(u) is
    therefore snapped to a coarse 1e-6 grid BEFORE the (exact, IEEE-
    identical) division by the integer weight; grid collisions are
    broken by doc_id on both engines, so the ordering never depends
    on libm ulps — only a value within ~4e-15 of a grid edge (odds
    ~1e-9/row) could differ, vs every near-tie pair before."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("long") % F.lit(9007199254740992).cast("long"))
        .cast("double") + F.lit(0.5)
    ) / F.lit(9007199254740992.0)
    es_key = F.round(-F.log(u), 6) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(es_key.asc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# Streaming twin — rolling 7-day distinct actives on a maintained table
# ---------------------------------------------------------------------------

@register(
    "stream_rolling_7d_distinct_users",
    tier="variant",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS u7
    FROM days
    JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_rolling_7d_distinct_users(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Rolling WAU as a stream: overlapping-window COUNT(DISTINCT)
    is not additive, so the maintained object is the DISTINCT
    (user_id, day) activity table — the upsert MERGE dedupes on the
    full key per micro-batch (idempotent under replay, same
    discipline as `stream_retention_cohorts`), and the trailing-7-day
    fanout + distinct count run AT READ over the maintained rollup
    (bounded 7×|user-days|), never the event history. Same oracle as
    the batch twin `rolling_7d_distinct_users`."""
    import os
    import tempfile

    from ..streaming.runner import run_foreach_batch, staged_files_dir
    from ..streaming.sinks import upsert_batch
    from .streaming_queries import _stage_once

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    in_dir = _stage_once(
        sf_dir, "rolling7d_events",
        lambda base: staged_files_dir(ev, base, n_files=3,
                                      order_col="ts"),
    )
    rundir = tempfile.mkdtemp(prefix="rdw_streamq_wau_")
    table_dir = os.path.join(rundir, "user_days")

    base_sink = upsert_batch(table_dir, keys=["user_id", "day"],
                             order_col="one")

    def sink(batch: DataFrame, batch_id: int) -> None:
        ud = (
            batch.select(
                "user_id",
                F.col("ts").cast("date").alias("day"),
                F.lit(1).alias("one"),
            ).distinct()
        )
        base_sink(ud, batch_id)

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    run_foreach_batch(sdf, sink, checkpoint_dir=os.path.join(rundir, "ck"),
                      output_mode="append")

    ud = spark.read.parquet(table_dir).select("user_id", "day")
    days = ud.select(F.col("day").alias("d")).distinct()
    fanned = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6)))
        .alias("target"),
    )
    return (
        fanned.join(F.broadcast(days),
                    fanned["target"] == days["d"], "left_semi")
        .groupBy(F.date_format("target", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("u7"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Cohort lifetime value — cumulative revenue per signup cohort
# ---------------------------------------------------------------------------

@register(
    "cohort_ltv_curve",
    oracle="""
    WITH su AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    wk AS (
        SELECT strftime(su.cohort, '%Y-%m-%d') AS cohort_week,
               CAST(floor(date_diff('day', CAST(su.cohort AS DATE),
                                    CAST(e.ts AS DATE)) / 7.0) AS INT)
                   AS week_offset,
               SUM(CAST(e.value AS DECIMAL(18,2))) AS rev
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.cohort
        GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset,
           CAST(rev AS DOUBLE) AS week_revenue,
           CAST(SUM(rev) OVER (
                    PARTITION BY cohort_week ORDER BY week_offset
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM wk
    WHERE week_offset BETWEEN 0 AND 11
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative purchase revenue per
    signup-week cohort by week offset — the money twin of
    `retention_cohorts` (which counts actives). Scale plan: the
    signup extraction is a per-user rollup broadcast into the
    purchase scan (stream-static J3 shape batched); revenue reduces
    to the (cohort, offset) grid — ≤ |weeks|·12 rows — BEFORE the
    cumulative window, so the running sum runs over the bounded
    grid, never the events. Decimal week sums make the cumulative
    doubles grid-exact on both engines (partition-local prefix sums
    of exact decimals)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    wk = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(su), "user_id")
        .filter(F.col("ts") >= F.col("cohort"))
        .withColumn(
            "week_offset",
            F.floor(F.datediff(F.col("ts").cast("date"),
                               F.col("cohort").cast("date"))
                    / F.lit(7.0)).cast("int"))
        .filter(F.col("week_offset").between(0, 11))
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    )
    w = (Window.partitionBy("cohort_week").orderBy("week_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return wk.select(
        "cohort_week", "week_offset",
        F.col("rev").cast("double").alias("week_revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    ).orderBy("cohort_week", "week_offset")


# ---------------------------------------------------------------------------
# Frequent items (round 5 batch 5, appended last) — the bounded-memory
# heavy-hitters kernel (operators/sketches.py). The reference has no
# sketch surface; this is a scale-path addition for key cardinalities
# too large to shuffle in full.
# ---------------------------------------------------------------------------

@register(
    "heavy_hitter_users",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN user_id % 5 < 2 THEN user_id % 3
                    ELSE user_id END AS hh_key
        FROM events
    ), tot AS (SELECT count(*) AS n FROM keyed)
    SELECT hh_key, count(*) AS cnt
    FROM keyed GROUP BY 1
    HAVING count(*) >= (SELECT CAST(ceil(n * 0.005) AS BIGINT) FROM tot)
    """,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (frequency ≥ 0.5%) over a deliberately
    skewed key via distributed two-pass Misra–Gries
    (operators/sketches.exact_heavy_hitters). The testdata's user_id
    is near-uniform, so — same trick as bench.py's skew section — a
    deterministic CASE folds ~40% of events onto 3 hot keys; the
    mapping is part of the query on BOTH engines, so the oracle is
    exact. Scale plan: pass A moves only partitions×ceil(1/phi)
    candidate rows out of the mappers (never |distinct keys|); pass B
    exact-counts the broadcast candidates map-side. The result is
    bit-identical to the full GROUP BY ... HAVING the oracle runs —
    sketch as EXECUTION STRATEGY, not approximation."""
    from ..operators.sketches import exact_heavy_hitters

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 < 2, F.col("user_id") % 3)
        .otherwise(F.col("user_id")).alias("hh_key"))
    return exact_heavy_hitters(ev, "hh_key", phi=0.005)
