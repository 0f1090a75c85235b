"""Engine surface beyond the reference's own queries (SURVEY §2.6/§2.7).

The reference has no ORDER BY / LIMIT / set ops / OVER clauses
anywhere (SURVEY §2.6-2.7); a user switching engines still expects
them, so they are first-class here with oracle coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import composite_key, iff
from ..operators.joins import asof_join
from ..sources.batch import load_table
from .registry import register


@register(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, sku_id, revenue, rk FROM (
        SELECT p.p_brand,
               l.l_partkey AS sku_id,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l.l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
               row_number() OVER (
                   PARTITION BY p.p_brand
                   ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                                * CAST(1 - l.l_discount AS DECIMAL(3,2))) DESC,
                            l.l_partkey
               ) AS rk
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_partkey
    ) WHERE rk <= 3
    """,
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: ranking OVER window (§2.6). Pre-aggregates per
    (brand, sku) before ranking, so the window operator sees one row
    per sku, not per lineitem — at 100 TB the rank input is the
    aggregate, never the fact table. Deterministic tie-break on
    sku_id keeps the hash stable.

    r12 measured dead end (do not retry): fan_out on the fact side
    read neutral in an interleaved A/B (1.43 plain vs 1.47 min-of-5)
    — the (brand, sku) partials barely collapse, same as
    weighted_median_price."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    per_sku = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", F.col("l_partkey").alias("sku_id"))
        .agg(F.sum(price * disc).alias("rev_dec"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("rev_dec").desc(), F.col("sku_id"))
    return (
        per_sku.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "sku_id", F.col("rev_dec").cast("double").alias("revenue"), "rk")
    )


@register(
    "top100_orders",
    oracle="""
    SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def top100_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (§2.7). Spark plans this as TakeOrderedAndProject
    — per-partition top-100 then a single merge, no global sort, which
    is exactly the scale-safe plan."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.col("o_totalprice").cast("decimal(14,2)").cast("double").alias("total"))
    )


@register(
    "set_ops_users",
    oracle="""
    SELECT user_id FROM (
        SELECT o_custkey AS user_id FROM orders WHERE o_totalprice > 200000
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_nationkey = 0
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT (§2.7): big-spender ∪ high-balance users, minus
    nation-0 users. Set ops hash-shuffle on the full row — fine here
    (single narrow column)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spenders = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("user_id")
    )
    rich = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("user_id")
    )
    nation0 = customer.filter(F.col("c_nationkey") == 0).select(
        F.col("c_custkey").alias("user_id")
    )
    return spenders.union(rich).distinct().exceptAll(nation0.distinct())


@register(
    "f_scalar_kitchen_sink",
    oracle="""
    SELECT o_orderkey AS id,
           strftime(o_orderdate, '%Y-%m-%d')                       AS order_date,
           strftime(o_orderdate, '%Y%m%d')                         AS dt_partition,
           CAST(epoch(o_orderdate) AS BIGINT)                      AS epoch_s,
           strftime(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS roundtrip,
           o_orderstatus || ':' || o_orderpriority                 AS composite,
           CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket,
           CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)     AS price,
           upper(o_orderpriority)                                  AS prio_upper,
           str_split(o_orderpriority, '-')[1]                      AS prio_code
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def f_scalar_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F14 in one projection (SURVEY §2.8): date_format partitions
    (DateFormatUtil.java:55-59), epoch round-trips (SQLUtil.java:26),
    if(), composite keys (F12), CSV split (F13), casts — all built-in
    expressions inside one whole-stage-codegen span."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("dt_partition"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.timestamp_seconds(F.unix_timestamp("o_orderdate")),
                      "yyyy-MM-dd HH:mm:ss").alias("roundtrip"),
        composite_key("o_orderstatus", "o_orderpriority").alias("composite"),
        iff(F.col("o_totalprice") > 100000, F.lit("big"), F.lit("small")).alias("bucket"),
        F.col("o_totalprice").cast("decimal(14,2)").cast("double").alias("price"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).alias("prio_code"),
    )


@register(
    "asof_last_error",
    oracle="""
    WITH err AS (
        SELECT user_id, ts, max(event_id) AS err_id
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ), lft AS (
        SELECT user_id, ts, event_id, event_type
        FROM events WHERE event_type <> 'error'
    )
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.event_type,
           e.err_id, epoch_us(e.ts) AS err_ts_us
    FROM lft l ASOF LEFT JOIN err e
      ON l.user_id = e.user_id AND l.ts >= e.ts
    """,
)
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.asof_join): each non-error event
    picks up the same user's most recent error event at or before it.
    Oracle is DuckDB's native ASOF LEFT JOIN. The right side is
    deduped per (user, ts) so the match is well-defined in both
    engines. Plan: one shuffle + sort on user_id over the union —
    no per-row range probe (see asof_join docstring)."""
    ev = load_table(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
    )
    left = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id", "event_type"
    )
    j = asof_join(left, err, key="user_id", left_ts="ts", right_ts="ts")
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "err_id",
        F.unix_micros("matched_ts").alias("err_ts_us"),
    )


@register(
    "semi_anti_customers",
    oracle="""
    SELECT n_name,
           CAST(SUM(CASE WHEN EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
           ) THEN 1 ELSE 0 END) AS BIGINT) AS active_customers,
           CAST(SUM(CASE WHEN NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
           ) THEN 1 ELSE 0 END) AS BIGINT) AS inactive_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI / LEFT ANTI joins (§2.4 "not present in reference" —
    first-class engine capability): per nation, customers with ≥1
    urgent order vs none. Semi/anti are the scale-right plan for
    EXISTS — the urgent-key side is distinct-projected to one narrow
    column before the shuffle, and no payload is duplicated."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    active = (
        customer.join(urgent, "c_custkey", "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )
    inactive = (
        customer.join(urgent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("inactive_customers"))
    )
    base = customer.select("c_nationkey").distinct()
    return (
        base.join(active, "c_nationkey", "left")
        .join(inactive, "c_nationkey", "left")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.coalesce("active_customers", F.lit(0)).alias("active_customers"),
            F.coalesce("inactive_customers", F.lit(0)).alias("inactive_customers"),
        )
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS r_name,
           COALESCE(n_name, 'ALL') AS n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS order_count
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(region.r_name, nation.n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (§2.5 "no grouping sets in reference" —
    engine capability): region → nation → grand-total revenue in one
    pass. Spark expands rollup into partial-aggregated grouping sets —
    still a single shuffle; nation/region attach via broadcast before
    the agg so the rollup keys are plain columns."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        enriched.rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "revenue",
            "order_count",
        )
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join + agg: revenue from local suppliers
    per ASIA nation. The plan to want at 100 TB: lineitem⋈orders is
    the one big shuffle (both huge, equi on orderkey); supplier,
    nation, region broadcast; customer joins on custkey after the date
    filter prunes orders. The region filter reaches the region scan
    and cascades through the broadcast chain."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
    )


@register(
    "sessionize_user_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT *, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
        ) AS sid
        FROM ordered
    )
    SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S')                    AS session_start,
           strftime(max(ts) + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S')  AS session_end,
           user_id,
           count(*)                                                  AS events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)         AS value_sum
    FROM sess GROUP BY user_id, sid
    """,
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (operators/agg.session_agg): per-user activity
    sessions closed by a 2-hour silence. The oracle is the equivalent
    gaps-and-islands SQL (lag + running flag-sum); Spark's native
    F.session_window plans the same single exchange + sort. A session's
    end is last-event + gap — both sides encode that bound."""
    from ..operators.agg import session_agg

    ev = load_table(spark, sf_dir, "events")
    return session_agg(
        ev, "ts", "2 hours", ["user_id"],
        aggs={
            "events": F.count(F.lit(1)),
            "value_sum": F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
        },
    )


# ---------------------------------------------------------------------------
# Range join — binned point-in-interval (operators/joins.range_join)
# ---------------------------------------------------------------------------

#: deterministic promo calendar: 120 windows of 90 min every 6 h
#: through the events month (2024-01). Epochs in MICROseconds to keep
#: full event-time precision through the bin arithmetic.
_PROMO_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_PROMO_STEP_US = 6 * 3600 * 1_000_000
_PROMO_LEN_US = 90 * 60 * 1_000_000
_RANGE_BIN_US = 30 * 60 * 1_000_000  # ~median interval length / 3


@register(
    "range_join_promo_windows",
    oracle="""
    WITH promos AS (
        SELECT i AS promo_id, i % 3 AS tier,
               TIMESTAMP '2024-01-01 00:00:00'
                   + to_microseconds(i * 21600000000)            AS st,
               TIMESTAMP '2024-01-01 00:00:00'
                   + to_microseconds(i * 21600000000 + 5400000000) AS en
        FROM (SELECT unnest(range(0, 120)) AS i)
    )
    SELECT p.promo_id, p.tier,
           count(*)                                           AS ev_ct,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM promos p JOIN events e ON e.ts >= p.st AND e.ts < p.en
    GROUP BY 1, 2
    """,
)
def range_join_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: attribute every event to the
    active promo window. The binning rewrite turns `ts BETWEEN s AND e`
    — which Catalyst can only plan as a nested loop — into an equi-join
    on 30-min buckets with a residual filter (range_join docstring has
    the cost model). The oracle brute-forces the BETWEEN join, proving
    the rewrite loses no pairs at bucket boundaries."""
    from ..operators.joins import range_join

    events = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("ev_us"), "value"
    )
    promos = spark.range(0, 120).select(
        F.col("id").cast("int").alias("promo_id"),
        (F.col("id") % 3).cast("int").alias("tier"),
        (F.lit(_PROMO_BASE_US) + F.col("id") * _PROMO_STEP_US).alias("st_us"),
        (F.lit(_PROMO_BASE_US) + F.col("id") * _PROMO_STEP_US + _PROMO_LEN_US)
        .alias("en_us"),
    )
    joined = range_join(events, promos, "ev_us", "st_us", "en_us",
                        bin_width=_RANGE_BIN_US)
    return joined.groupBy("promo_id", "tier").agg(
        F.count(F.lit(1)).alias("ev_ct"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# Hypertable rollup — hierarchical time_bucket partial re-aggregation
# ---------------------------------------------------------------------------

@register(
    "time_bucket_rollup_events",
    oracle="""
    SELECT 'hour' AS grain, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           count(*) AS ev_ct,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
           count(*), CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'month', strftime(date_trunc('month', ts), '%Y-%m-%d %H:%M:%S'),
           count(*), CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events GROUP BY 2
    """,
)
def time_bucket_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour→day→month continuous-aggregate hierarchy over events; the
    day and month levels re-aggregate the hour partials (one base
    scan total — agg.time_bucket_rollup docstring has the plan). The
    oracle computes every grain straight from the base table, so the
    hash check proves partial re-aggregation is lossless. Decimal sums
    keep the check exact across the two aggregation orders."""
    from ..operators.agg import time_bucket_rollup

    events = load_table(spark, sf_dir, "events")
    return time_bucket_rollup(
        events, "ts",
        {
            "ev_ct": F.count(F.lit(1)),
            "value_sum": F.sum(F.col("value").cast("decimal(18,2)")),
        },
    ).withColumn("value_sum", F.col("value_sum").cast("double"))


# ---------------------------------------------------------------------------
# Quantiles — exact interpolated percentiles (oracle) + sketch twin
# ---------------------------------------------------------------------------

@register(
    "percentile_revenue",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY 1
    """,
)
def percentile_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per return flag —
    F.percentile and DuckDB quantile_cont share the same definition,
    so values match to float rounding (pinned at 4 decimals). At scale
    exact percentile is a sort-heavy op; the sketch twin below is the
    100 TB path."""
    from ..sources.batch import fan_out

    # fan_out: the partial percentile buffers are sort-heavy map work —
    # under a single-row-group layout they'd otherwise build on 1 core
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    # one percentile agg with an array argument: a single value buffer
    # + one sort per group, vs three separate aggregates each
    # buffering and sorting the whole group (~3× the work)
    pcts = F.percentile("l_extendedprice",
                        F.array(F.lit(0.50), F.lit(0.90), F.lit(0.99)))
    return li.groupBy("l_returnflag").agg(pcts.alias("__p")).select(
        "l_returnflag",
        F.round(F.col("__p")[0], 4).alias("p50"),
        F.round(F.col("__p")[1], 4).alias("p90"),
        F.round(F.col("__p")[2], 4).alias("p99"),
    )


@register("sketch_quantiles_distinct")  # sketch internals: rows-only check
def sketch_quantiles_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch surface for 100 TB interactive analytics:
    approx_percentile (KLL-style) and approx_count_distinct (HLL) per
    return flag — O(k) state per group, map-side partials merge
    associatively, no sort. No SQL oracle: sketch estimates are
    engine-specific by construction (the exact twins above and in A3
    are the correctness anchors). All output columns are scalars (the
    percentile array is unpacked) so the driver's row canonicalization
    can sort them."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.approx_percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return li.groupBy("l_returnflag").agg(
        pcts.alias("__p"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    ).select(
        "l_returnflag",
        F.col("__p")[0].alias("approx_p50"),
        F.col("__p")[1].alias("approx_p90"),
        F.col("__p")[2].alias("approx_p99"),
        "approx_orders",
        "approx_parts",
    )


# ---------------------------------------------------------------------------
# OVER-clause analytics (SURVEY §2.6: none in the reference — Spark
# window functions made concrete, not just "available")
# ---------------------------------------------------------------------------

@register(
    "running_revenue_by_customer",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DECIMAL(14,2)) AS amt
        FROM orders WHERE o_custkey % 100 = 0
    )
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(amt) OVER w AS DOUBLE) AS running_total,
           CAST(COALESCE(amt - lag(amt) OVER w, 0) AS DOUBLE) AS delta_vs_prev,
           row_number() OVER w AS order_seq
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def running_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals, lag deltas and sequence numbers per customer —
    the analytic OVER-clause family (running frame + lag + rank) in
    one pass: all three share ONE window spec, so Catalyst plans a
    single exchange on custkey + one sort, not three. The customer
    filter keeps the driver comparison small; the plan is
    filter-pushdown → exchange → sort → window, identical at any SF."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    amt = F.col("o_totalprice").cast("decimal(14,2)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(amt).over(run).cast("double").alias("running_total"),
        F.coalesce(amt - F.lag(amt).over(w), F.lit(0)).cast("double")
        .alias("delta_vs_prev"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "pivot_status_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS f_amount,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS o_amount,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS p_amount
    FROM orders GROUP BY 1
    """,
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an EXPLICIT value list — the form that
    scales: pivot without declared values costs an extra distinct scan
    to discover columns, and unbounded status domains explode the
    schema. Declared values compile to the same conditional aggregates
    the oracle spells out; one shuffle on the year."""
    orders = load_table(spark, sf_dir, "orders")
    amt = F.col("o_totalprice").cast("decimal(14,2)")
    wide = (
        orders.select(F.year("o_orderdate").alias("order_year"),
                      "o_orderstatus", amt.alias("amt"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("amt"))
    )
    return wide.select(
        "order_year",
        F.col("F").cast("double").alias("f_amount"),
        F.col("O").cast("double").alias("o_amount"),
        F.col("P").cast("double").alias("p_amount"),
    )


@register(
    "top_unshipped_orders",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1997-03-15'
      AND l.l_shipdate  > DATE '1997-03-15'
    GROUP BY 1, 3
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter (broadcast) → fact join →
    aggregate → top-k. Both date predicates reach the parquet scans
    (pushdown), the customer side broadcasts, and the final ORDER BY +
    LIMIT plans TakeOrderedAndProject over the aggregate — per-
    partition heaps + one driver merge, never a global sort. Ties
    break on orderkey in BOTH engines so the LIMIT boundary is
    deterministic."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    joined = (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    agg = joined.groupBy(
        F.col("l_orderkey").alias("orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    ).agg(F.sum(price * disc).cast("double").alias("revenue"))
    return agg.orderBy(F.col("revenue").desc(), "orderkey").limit(10).select(
        "orderkey", "revenue", "order_date"
    )


_PROFILE_COLS = (
    ("o_orderkey", "CAST({m}(o_orderkey) AS VARCHAR)"),
    ("o_custkey", "CAST({m}(o_custkey) AS VARCHAR)"),
    ("o_orderstatus", "CAST({m}(o_orderstatus) AS VARCHAR)"),
    ("o_totalprice", "CAST(CAST({m}(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderdate", "strftime({m}(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
    ("o_orderpriority", "CAST({m}(o_orderpriority) AS VARCHAR)"),
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT)                 AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT)    AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT)      AS n_distinct,
           {tmpl.format(m='min')}                   AS min_value,
           {tmpl.format(m='max')}                   AS max_value
    FROM orders"""
    for c, tmpl in _PROFILE_COLS
)


@register("profile_orders", oracle=_PROFILE_ORACLE)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiler (operators/agg.profile_columns) over the
    orders table: per-column row/null/exact-distinct counts and
    native-typed min/max, all from ONE aggregate over ONE scan (the
    multi-distinct Expand is the documented exact-mode trade; pass
    exact_distinct=False for the HLL no-Expand variant at warehouse
    scale). The oracle is the same profile written longhand as one
    UNION ALL per column."""
    from ..operators.agg import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders)


@register(
    "incremental_agg_refresh",
    oracle="""
    SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(date_trunc('day', l_shipdate) + INTERVAL 1 DAY,
                    '%Y-%m-%d %H:%M:%S')                                AS edt,
           strftime(date_trunc('day', l_shipdate), '%Y-%m-%d')          AS cur_date,
           l_partkey                                                    AS sku_id,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE)  AS order_amount,
           CAST(count(*) AS BIGINT)                                     AS order_ct
    FROM lineitem GROUP BY 1, 2, 3, 4
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: a stored window aggregate is
    refreshed by merging the LATE batch's partial aggregates into the
    base partials — additive aggs (decimal sums, counts) re-aggregate
    losslessly, so the refresh never rescans the base facts. Here the
    fact table splits deterministically into on-time (95%) and late
    (5%) slices; each aggregates independently (in production the
    base side is the STORED aggregate table — zero scan) and the
    merge is one tiny shuffle over aggregate rows. The oracle
    aggregates the unsplit table directly, proving
    incremental == full recompute bit-for-bit. Exactness rule: sums
    stay DECIMAL through the partial and merge stages, cast to DOUBLE
    only at the end (double partials would round differently than the
    one-pass oracle)."""
    from ..operators.agg import tumble

    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")

    def day_agg(df: DataFrame) -> DataFrame:
        return tumble(
            df.withColumn("amount", price * disc), "l_shipdate", "1 day",
            keys=["l_partkey"],
            aggs={
                "amount_dec": F.sum("amount"),
                "order_ct": F.count(F.lit(1)),
            },
        )

    on_time = day_agg(li.filter(F.pmod("l_orderkey", F.lit(20)) != 0))
    late = day_agg(li.filter(F.pmod("l_orderkey", F.lit(20)) == 0))
    merged = on_time.unionByName(late).groupBy(
        "stt", "edt", "cur_date", "l_partkey"
    ).agg(
        F.sum("amount_dec").alias("amount_dec"),
        F.sum("order_ct").alias("order_ct"),
    )
    return merged.select(
        "stt", "edt", "cur_date",
        F.col("l_partkey").alias("sku_id"),
        F.col("amount_dec").cast("double").alias("order_amount"),
        "order_ct",
    )


@register(
    "mv_rollup_rewrite",
    oracle="""
    SELECT l_returnflag,
           strftime(date_trunc('month', l_shipdate), '%Y-%m')    AS month,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE)
               AS revenue,
           CAST(count(*) AS BIGINT)                              AS order_ct,
           -- avg at 6 decimals, rounded HALF-UP in pure integer math:
           -- a double→decimal cast would tie-break differently across
           -- engines when sum/count lands exactly on a .5 grid point
           CAST((2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(3,2)))
                          * 1000000 AS BIGINT) + count(*))
                // (2 * count(*)) AS DOUBLE)
               / CAST(1000000 AS DOUBLE)                         AS avg_revenue
    FROM lineitem GROUP BY 1, 2
    """,
)
def mv_rollup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-navigator rewrite: a MONTHLY revenue query answered
    entirely FROM the daily materialized view — never the fact table.
    The daily MV keeps additive partials (decimal sum, count); the
    monthly rollup re-aggregates those partials and derives avg from
    merged sum/count, so the coarser grain is exact — the oracle
    computes monthly straight from the facts and the hash gate proves
    MV-answered == fact-answered bit-for-bit. This is the query-
    rewrite contract every MV system (Calcite, Druid, continuous
    aggregates) relies on: at 100 TB the second aggregation reads
    O(days × keys) MV rows, not O(facts) — here both stages appear in
    one plan only because the MV is built inline; in production the
    daily stage IS the stored table that incremental_agg_refresh
    (above) maintains. Derivability rule: only additive partials
    (sum, count) live in the MV; avg is derived AFTER the merge —
    storing avg itself would make the rollup inexact."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    daily_mv = (
        li.groupBy("l_returnflag",
                   F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(F.sum(price * disc).alias("rev_dec"),
             F.count(F.lit(1)).alias("order_ct"))
    )
    monthly = (
        daily_mv.groupBy(
            "l_returnflag",
            F.date_format(F.date_trunc("month", "day"), "yyyy-MM")
            .alias("month"))
        .agg(F.sum("rev_dec").alias("rev_dec"),
             F.sum("order_ct").alias("order_ct"))
    )
    # half-up rounding to the 1e-6 grid in pure integer math — a
    # double→decimal cast ties differently across engines when the
    # quotient lands exactly on a .5 grid point (it does at sf0.001)
    n_micro = (F.col("rev_dec") * 1000000).cast("long")
    q = F.expr("(2 * __n + order_ct) div (2 * order_ct)")
    return monthly.withColumn("__n", n_micro).select(
        "l_returnflag", "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        "order_ct",
        (q.cast("double") / F.lit(1000000).cast("double"))
        .alias("avg_revenue"),
    )


@register(
    "sliding_traffic_window",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S')                    AS stt,
           strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S')  AS edt,
           strftime(ws, '%Y-%m-%d')                             AS cur_date,
           event_type,
           count(*)                                             AS pv,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)    AS value_sum
    FROM (
        SELECT e.ts, e.event_type, e.value,
               date_trunc('hour', e.ts) - to_hours(o.o) AS ws
        FROM events e
        CROSS JOIN (SELECT unnest([0, 1]) AS o) o
    )
    GROUP BY 1, 2, 3, 4
    """,
)
def sliding_traffic_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window traffic metrics (operators/agg.sliding): 2-hour
    windows hopping every hour, per event type — each event lands in
    exactly 2 windows (its own hour's window and the previous
    hour's). The oracle materializes the same assignment by
    cross-joining each event with offsets {0,1} hours. Not present in
    the reference (tumbling only, SURVEY §2.9 T5)."""
    from ..operators.agg import sliding

    events = load_table(spark, sf_dir, "events")
    return sliding(
        events, "ts", "2 hours", "1 hour", keys=["event_type"],
        aggs={
            "pv": F.count(F.lit(1)),
            "value_sum": F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
        },
    ).select("stt", "edt", "cur_date", "event_type", "pv", "value_sum")


@register(
    "cube_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL')  AS return_flag,
           coalesce(l_linestatus, 'ALL')  AS line_status,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS line_ct
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (the ROLLUP twin's full-lattice form): all
    2^2 aggregation levels from ONE shuffle — Catalyst expands the
    grouping sets before the exchange (Expand operator), so the fact
    table is scanned and shuffled once, not once per level. NULL
    grouping markers are coalesced to 'ALL' identically in both
    engines so the hash is stable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_ct"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "revenue", "line_ct",
        )
    )


@register(
    "moving_avg_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,2)))             AS rev
        FROM orders GROUP BY 1
    )
    SELECT d,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
           / COUNT(rev) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           )                   AS ma7,
           CAST(first_value(rev) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)        AS window_first
    FROM daily
    """,
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame analytics (§2.6 depth): 7-day moving average and
    first_value over a ROWS frame. The frame runs over the per-day
    AGGREGATE (one row per day — a bounded, tiny window input), never
    the raw orders; the single unpartitioned window is safe because
    its input is the daily rollup, not the fact table. The average is
    expressed as exact-DECIMAL frame SUM / frame COUNT with ONE IEEE
    division (decimal AVG scale rules differ between engines: Spark
    truncates the quotient at 6 decimals, DuckDB doesn't)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("d")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d",
        F.col("rev").cast("double").alias("revenue"),
        (F.sum("rev").over(w).cast("double") / F.count("rev").over(w)).alias("ma7"),
        F.first("rev").over(w).cast("double").alias("window_first"),
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*)                                        AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)  AS value_sum
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the JSON `props` payload
    (F14's schemaless half): extract a typed field with
    get_json_object, bucket and aggregate it. The JSON path
    evaluation is a JVM expression inside the scan's codegen stage —
    no parse-to-struct materialization, no Python."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_sum"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@register("hll_rollup_daily_uv")  # sketch internals: rows-only check
def hll_rollup_daily_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the distinct-count half of the
    hypertable pattern (time_bucket_rollup handles additive metrics;
    exact distincts can NEVER re-aggregate from partials): hourly HLL
    sketches of user_id, hll_union'd into daily sketches, estimated.
    The daily level touches only 24 sketch rows per day, never the
    raw events — at 100 TB this is THE way a continuous aggregate
    serves "daily uniques" without rescanning facts.

    No SQL oracle: sketch bytes are engine-specific (DataSketches
    HLL). Correctness anchors: the unit test pins merged-estimate ==
    direct-estimate per day (HLL register state is order-insensitive,
    so the union of hourly sketches must estimate exactly what one
    daily sketch does), and dws_home_detail_uv_window carries the
    exact-distinct oracle for the same column."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.hll_sketch_agg(F.col("user_id")).alias("sk"))
    daily = hourly.groupBy(
        F.date_format(F.date_trunc("day", "bucket"), "yyyy-MM-dd").alias("cur_date")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("uv_estimate"))
    return daily.select("cur_date", "uv_estimate")


@register(
    "gapfill_hourly_values",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               SUM(CAST(value AS DECIMAL(18,2))) AS value_sum,
               count(*) AS n
        FROM events WHERE value > 90 GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
        FROM hourly GROUP BY 1
    ),
    cal AS (
        SELECT b.event_type, unnest(generate_series(b.b0, b.b1, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    joined AS (
        SELECT c.event_type, c.bucket,
               CASE WHEN h.value_sum IS NULL THEN 1 ELSE 0 END AS is_gapfilled,
               last_value(h.value_sum IGNORE NULLS) OVER (
                   PARTITION BY c.event_type ORDER BY c.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_sum,
               last_value(h.n IGNORE NULLS) OVER (
                   PARTITION BY c.event_type ORDER BY c.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n
        FROM cal c LEFT JOIN hourly h USING (event_type, bucket)
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           is_gapfilled,
           CAST(value_sum AS DOUBLE) AS value_sum,
           CAST(n AS BIGINT) AS n
    FROM joined
    """,
)
def gapfill_hourly_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (operators/agg.gapfill_locf): high-
    value events bucket to a sparse hourly series (~half the hours
    empty), the per-type calendar densifies it, and LOCF carries the
    last observed values across the holes with an is_gapfilled flag —
    the hypertable time_bucket_gapfill + locf pair. The calendar
    explode runs on the ROLLUP's cardinality, never raw events."""
    from ..operators.agg import gapfill_locf

    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("value") > 90)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    filled = gapfill_locf(hourly, "bucket", ["event_type"],
                          ["value_sum", "n"], step="1 hour")
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "is_gapfilled",
        F.col("value_sum").cast("double").alias("value_sum"),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "gapfill_hourly_interp",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               SUM(CAST(value AS DECIMAL(18,2))) AS value_sum
        FROM events WHERE value > 90 GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
        FROM hourly GROUP BY 1
    ),
    cal AS (
        SELECT b.event_type,
               unnest(generate_series(b.b0, b.b1, INTERVAL 1 HOUR)) AS bucket
        FROM bounds b
    ),
    j AS (
        SELECT c.event_type, c.bucket,
               row_number() OVER (
                   PARTITION BY c.event_type ORDER BY c.bucket) AS rn,
               h.value_sum,
               CASE WHEN h.value_sum IS NULL THEN 1 ELSE 0 END AS is_gapfilled
        FROM cal c LEFT JOIN hourly h USING (event_type, bucket)
    ),
    f AS (
        SELECT *,
               last_value(CASE WHEN is_gapfilled = 0 THEN
                   struct_pack(rn := rn, v := value_sum) END IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY rn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
               first_value(CASE WHEN is_gapfilled = 0 THEN
                   struct_pack(rn := rn, v := value_sum) END IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY rn
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        FROM j
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           is_gapfilled,
           CAST(CAST(CASE
               WHEN is_gapfilled = 0 THEN CAST(value_sum AS DOUBLE)
               WHEN p IS NULL THEN CAST(nx.v AS DOUBLE)
               WHEN nx IS NULL THEN CAST(p.v AS DOUBLE)
               ELSE CAST(p.v * (nx.rn - rn) + nx.v * (rn - p.rn) AS DOUBLE)
                    / CAST(nx.rn - p.rn AS DOUBLE)
           END AS DECIMAL(18,6)) AS DOUBLE) AS value_interp
    FROM f
    """,
)
def gapfill_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup with LINEAR INTERPOLATION
    (operators/agg.gapfill_interp) — the `interpolate` half of the
    hypertable time_bucket_gapfill pair, next to the LOCF form above.
    Holes get the straight-line value between the surrounding observed
    buckets (leading/trailing holes take the nearest observation).
    Interpolation weights are dense-calendar row numbers — small exact
    integers — so decimal sums stay exact until one final double
    division, stabilized through DECIMAL(18,6) on both engines."""
    from ..operators.agg import gapfill_interp

    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("value") > 90)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"))
    )
    filled = gapfill_interp(hourly, "bucket", ["event_type"], "value_sum",
                            step="1 hour")
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "is_gapfilled",
        F.col("value_sum").cast("decimal(18,6)").cast("double")
        .alias("value_interp"),
    )


@register(
    "late_dim_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_facts,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphans
    FROM lineitem l
    LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders ord
    LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 5 <> 0) c
      ON ord.o_custkey = c.c_custkey
    """,
)
def late_dim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the operational check a streaming
    warehouse runs when facts can outrun their dimensions (the
    reference buffers such rows behind its broadcast-config bootstrap,
    DimBroadcastFunction.java:32-43): per FK edge, how many fact rows
    have no matching dim row. Dim sides are deliberately punctured
    (every 3rd order / 5th customer withheld, as a late-arriving-dim
    stand-in) so the audit exercises nonzero orphan counts. Anti-join
    semantics expressed as LEFT JOIN + null-count in ONE pass per
    edge (a separate anti join per metric would scan twice); dim key
    sets broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o_part = F.broadcast(
        orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey")
    )
    c_part = F.broadcast(
        customer.filter(F.col("c_custkey") % 5 != 0).select("c_custkey")
    )
    e1 = li.join(o_part, li["l_orderkey"] == F.col("o_orderkey"), "left").agg(
        F.lit("lineitem->orders").alias("fk_edge"),
        F.count(F.lit(1)).alias("n_facts"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_orphans"),
    )
    e2 = orders.join(c_part, orders["o_custkey"] == F.col("c_custkey"), "left").agg(
        F.lit("orders->customer").alias("fk_edge"),
        F.count(F.lit(1)).alias("n_facts"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("n_orphans"),
    )
    return e1.unionByName(e2)


@register("dedup_simhash_fast",  # xxhash64 family: no SQL twin → rows-only
          tier="variant")
def dedup_simhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perf variant of dedup_simhash: identical pipeline (64-bit vote,
    pigeonhole block join, hamming ≤ 8) on xxhash64 token hashes —
    ~3× cheaper per token than md5 and the hash you'd run at 100 TB,
    but with no ANSI-SQL twin, so the driver records the weaker
    rows-only check. The oracle-checked md5 family (`dedup_simhash`,
    plans/datapipe.py) proves the operator bit-for-bit; pytest
    additionally cross-checks these pairs ⊇ exact ≥0.95-Jaccard
    pairs (tests/test_datapipe.py)."""
    from ..operators import dedup as D
    from ..sources.batch import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return D.simhash_pairs(docs, max_hamming=8)
