"""SQL entry point — the BaseSQLApp path (SURVEY §3.2).

Six of the reference's apps are pure Flink SQL: DDL registers
source/sink tables, `sqlQuery` chains CTE-like temporary views,
`insertInto` submits (BaseSQLApp.java:15-69,
DwdTradeOrderDetail.java:46-160). The Spark twin is
`register_views` + `spark.sql(...)`: same catalog mechanics, same
query text style, Catalyst instead of Calcite.

These queries are deliberately written as SQL strings over the
registered views — they prove a reference user can keep their SQL
workflow (temp views, multi-stage CTEs, lateral explode) unchanged.
Catalyst treats them identically to the DataFrame plans (same
optimizations, same physical operators), so there is no perf cliff
between the two entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.tokenize import register_sql_functions
from ..sources.batch import register_views
from .registry import register

# ---------------------------------------------------------------------------
# DwdTradeOrderDetail in SQL: the 4-way CTE-chained join, exactly as
# the reference writes it (order_detail ⋈ order_info ⟕ activity ⟕
# coupon — DwdTradeOrderDetail.java:68-160's createTemporaryView
# chain becomes a WITH chain).
# ---------------------------------------------------------------------------

_ORDER_DETAIL_SQL = """
WITH detail AS (
    SELECT l_orderkey AS order_id,
           l_orderkey * 100 + l_linenumber AS id,
           l_partkey   AS sku_id,
           l_quantity  AS sku_num,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS split_original_amount
    FROM lineitem
), info AS (
    SELECT o_orderkey AS order_id, o_custkey AS user_id,
           o_orderdate AS create_time
    FROM orders
), activity AS (
    SELECT o_orderkey AS order_id, o_orderpriority AS activity_id
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
), coupon AS (
    SELECT o_orderkey AS order_id, o_orderstatus AS coupon_id
    FROM orders WHERE o_orderstatus = 'F'
)
SELECT d.id, d.order_id, d.sku_id, i.user_id,
       CAST(d.sku_num AS BIGINT) AS sku_num,
       CAST(d.split_original_amount AS DOUBLE) AS split_original_amount,
       a.activity_id, c.coupon_id,
       CAST(i.create_time AS STRING) AS create_time
FROM detail d
JOIN info i      ON d.order_id = i.order_id
LEFT JOIN activity a ON d.order_id = a.order_id
LEFT JOIN coupon c   ON d.order_id = c.order_id
"""


@register(
    "sql_trade_order_detail",
    oracle="""
    WITH detail AS (
        SELECT l_orderkey AS order_id,
               l_orderkey * 100 + l_linenumber AS id,
               l_partkey   AS sku_id,
               l_quantity  AS sku_num,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS split_original_amount
        FROM lineitem
    ), info AS (
        SELECT o_orderkey AS order_id, o_custkey AS user_id,
               o_orderdate AS create_time
        FROM orders
    ), activity AS (
        SELECT o_orderkey AS order_id, o_orderpriority AS activity_id
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), coupon AS (
        SELECT o_orderkey AS order_id, o_orderstatus AS coupon_id
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT d.id, d.order_id, d.sku_id, i.user_id,
           CAST(d.sku_num AS BIGINT) AS sku_num,
           CAST(d.split_original_amount AS DOUBLE) AS split_original_amount,
           a.activity_id, c.coupon_id,
           strftime(i.create_time, '%Y-%m-%d %H:%M:%S') AS create_time
    FROM detail d
    JOIN info i      ON d.order_id = i.order_id
    LEFT JOIN activity a ON d.order_id = a.order_id
    LEFT JOIN coupon c   ON d.order_id = c.order_id
    """,
)
def sql_trade_order_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 through the SQL surface: the reference's exact CTE-chain
    style (DwdTradeOrderDetail.java:104-160), run by spark.sql over
    registered views."""
    register_views(spark, sf_dir, ("lineitem", "orders"))
    return spark.sql(_ORDER_DETAIL_SQL)


# ---------------------------------------------------------------------------
# DwsTrafficSourceKeywordPageViewWindow in SQL: LATERAL explode of a
# tokenizer — the reference's `LEFT JOIN LATERAL TABLE(KwSplit(...))`
# (DwsTrafficSourceKeywordPageViewWindow.java:63-69) as SQL explode.
# ---------------------------------------------------------------------------


@register(
    "sql_keyword_window",
    oracle="""
    SELECT token AS keyword, count(*) AS keyword_count
    FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
        FROM documents
    )
    WHERE token <> ''
    GROUP BY 1
    """,
)
def sql_keyword_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+J6+A5 through the SQL surface: the registered `kw_split`
    SQL function (KwSplit UDTF analogue — a Spark 4 expression-backed
    SQL UDF, still codegen'd) exploded via LATERAL VIEW + grouped
    count, as the reference's SQL app writes it."""
    register_views(spark, sf_dir, ("documents",))
    register_sql_functions(spark)
    # SQL UDFs may not be referenced directly inside a Generate
    # (UNSUPPORTED_SQL_UDF_USAGE) — project the token array in a
    # subquery, then explode the attribute.
    return spark.sql("""
        SELECT keyword, count(*) AS keyword_count
        FROM (SELECT kw_split(text) AS toks FROM documents)
        LATERAL VIEW explode(toks) kw AS keyword
        GROUP BY keyword
    """)


# ---------------------------------------------------------------------------
# Subquery surface: correlated scalar subquery + IN subquery — absent
# in the reference (no subqueries anywhere); first-class because any
# SQL user migrating to this engine writes them on day one. Catalyst
# de-correlates both into joins (RewriteCorrelatedScalarSubquery),
# so the physical plan is an aggregate + equi-join, not a per-row
# re-execution.
# ---------------------------------------------------------------------------

_SUBQUERY_SQL = """
SELECT c.c_custkey AS custkey,
       c.c_name    AS name,
       CAST((SELECT max(CAST(o.o_totalprice AS DECIMAL(14,2)))
             FROM orders o WHERE o.o_custkey = c.c_custkey) AS DOUBLE)
           AS max_order_amount
FROM customer c
WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
  AND c.c_custkey % 10 = 0
"""


@register("sql_correlated_subquery", oracle=_SUBQUERY_SQL)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (max order per customer) + IN
    subquery filter, executed from the SQL entry point. The oracle is
    the IDENTICAL text — the portability claim is literal here."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQUERY_SQL)
