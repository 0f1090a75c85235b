"""Engine surface beyond the reference's own queries (SURVEY §2.6/§2.7).

The reference has no ORDER BY / LIMIT / set ops / OVER clauses
anywhere (SURVEY §2.6-2.7); a user switching engines still expects
them, so they are first-class here with oracle coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import composite_key, iff
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
    sku_id keeps the hash stable."""
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
