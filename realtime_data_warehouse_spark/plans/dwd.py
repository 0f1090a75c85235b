"""DWD-layer pipelines re-expressed over the driver tables.

Each query mirrors one reference DWD app (SURVEY §2), mapped onto the
TPC-H-ish testdata per FIXTURES.md §4 (order_detail→lineitem,
order_info→orders, payment→orders, base_dic→literal dim). CDC
envelopes are synthesized *inside* the query from the batch tables
with modulo-selected update rows, so the oracle SQL can state the
same end-to-end semantics directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.etl import (
    cart_add_predicate,
    cart_delta_num,
    cdc_etl_filter,
    flatten_data_map,
    status_transition_predicate,
)
from ..operators.joins import interval_join, lookup_join
from ..sources.batch import fan_out, load_table
from .registry import register


def _lineitem_cart_changelog(li: DataFrame) -> DataFrame:
    """Maxwell-style `topic_db` changelog of a cart_info-like table,
    synthesized from lineitem: every row an insert, plus an update
    (+5 quantity) for l_orderkey % 20 == 0 (FIXTURES.md §4 pattern).
    Exercises P1 envelope hygiene, P2/P4 predicates and P3 flatten."""
    rid = (F.col("l_orderkey") * 100 + F.col("l_linenumber")).cast("string")
    qty = F.col("l_quantity").cast("long")

    def envelope(typ, data_num, old_map):
        return [
            F.lit("gmall").alias("database"),
            F.lit("cart_info").alias("table"),
            F.lit(typ).alias("type"),
            F.unix_timestamp("l_shipdate").alias("ts"),
            F.create_map(
                F.lit("id"), rid,
                F.lit("sku_id"), F.col("l_partkey").cast("string"),
                F.lit("user_id"), F.col("l_suppkey").cast("string"),
                F.lit("sku_num"), data_num.cast("string"),
            ).alias("data"),
            old_map.alias("old"),
        ]

    inserts = li.select(*envelope("insert", qty, F.lit(None).cast("map<string,string>")))
    updates = li.filter(F.col("l_orderkey") % 20 == 0).select(
        *envelope(
            "update",
            qty + 5,
            F.create_map(F.lit("sku_num"), qty.cast("string")),
        )
    )
    # control records that the ETL filter must drop (DimApp.java:184-193)
    noise = li.limit(1).select(
        F.lit("gmall").alias("database"),
        F.lit("cart_info").alias("table"),
        F.lit("bootstrap-start").alias("type"),
        F.lit(0).cast("long").alias("ts"),
        F.lit(None).cast("map<string,string>").alias("data"),
        F.lit(None).cast("map<string,string>").alias("old"),
    )
    return inserts.unionByName(updates).unionByName(noise)


@register(
    "dwd_trade_cart_add",
    oracle="""
    SELECT l_orderkey * 100 + l_linenumber        AS id,
           l_partkey                              AS sku_id,
           l_suppkey                              AS user_id,
           CAST(l_quantity AS BIGINT)             AS sku_num,
           'insert'                               AS change_type
    FROM lineitem
    UNION ALL
    SELECT l_orderkey * 100 + l_linenumber, l_partkey, l_suppkey,
           5, 'update'
    FROM lineitem WHERE l_orderkey % 20 = 0
    """,
)
def dwd_trade_cart_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdTradeCartAdd (P1+P2+P3+P4/T12): CDC filter → cart predicate →
    flatten → delta-corrected sku_num (insert: n, update: new−old)."""
    li = load_table(spark, sf_dir, "lineitem")
    cdc = cdc_etl_filter(_lineitem_cart_changelog(li))
    carted = cdc.filter(cart_add_predicate())
    flat = flatten_data_map(
        carted,
        {"id": "long", "sku_id": "long", "user_id": "long"},
        keep=["type", "old", "data"],
    )
    return flat.select(
        "id", "sku_id", "user_id",
        cart_delta_num().alias("sku_num"),
        F.col("type").alias("change_type"),
    )


@register(
    "dwd_trade_order_detail",
    oracle="""
    SELECT l.l_orderkey * 100 + l.l_linenumber AS id,
           l.l_orderkey                        AS order_id,
           l.l_partkey                         AS sku_id,
           CAST(l.l_quantity AS BIGINT)        AS sku_num,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l.l_discount AS DECIMAL(3,2)) AS DOUBLE) AS split_total_amount,
           o.o_custkey                         AS user_id,
           strftime(o.o_orderdate, '%Y-%m-%d') AS create_time,
           a.activity_id,
           c.coupon_id
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN (
        SELECT l_orderkey * 100 + l_linenumber AS order_detail_id,
               l_orderkey % 5                  AS activity_id
        FROM lineitem WHERE l_orderkey % 7 = 0
    ) a ON l.l_orderkey * 100 + l.l_linenumber = a.order_detail_id
    LEFT JOIN (
        SELECT l_orderkey * 100 + l_linenumber AS order_detail_id,
               l_orderkey % 3                  AS coupon_id
        FROM lineitem WHERE l_orderkey % 11 = 0
    ) c ON l.l_orderkey * 100 + l.l_linenumber = c.order_detail_id
    """,
)
def dwd_trade_order_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdTradeOrderDetail (J1): 4-way order-wide join — detail ⋈ order
    ⟕ activity ⟕ coupon. Batch-exact form of the reference's
    TTL-bounded stream join (DwdTradeOrderDetail.java:68-92). The
    detail×order shuffle reuses the order_id hash partitioning for
    both left attachments (same key), so AQE plans one exchange per
    side — no broadcast forced here because activity/coupon scale
    with the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rid = (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("id")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    # r12 measured dead end (do not retry): fan_out on the probe side
    # read 1.06 s vs 0.96 s plain — the wide-row output materialization
    # after the three broadcast probes dominates, and the added
    # round-robin exchange of 600k detail rows buys nothing.
    detail = li.select(
        rid,
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_quantity").cast("long").alias("sku_num"),
        (price * disc).cast("double").alias("split_total_amount"),
    )
    order = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("create_time"),
    )
    activity = li.filter(F.col("l_orderkey") % 7 == 0).select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("order_detail_id"),
        (F.col("l_orderkey") % 5).alias("activity_id"),
    )
    coupon = li.filter(F.col("l_orderkey") % 11 == 0).select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("order_detail_id"),
        (F.col("l_orderkey") % 3).alias("coupon_id"),
    )
    wide = (
        detail.join(order, "order_id", "inner")
        .join(activity, detail["id"] == activity["order_detail_id"], "left")
        .drop("order_detail_id")
        .join(coupon, detail["id"] == coupon["order_detail_id"], "left")
        .drop("order_detail_id")
    )
    return wide.select(
        "id", "order_id", "sku_id", "sku_num", "split_total_amount",
        "user_id", "create_time", "activity_id", "coupon_id",
    )


@register(
    "dwd_trade_order_cancel",
    oracle="""
    SELECT o_orderkey                           AS id,
           o_custkey                            AS user_id,
           strftime(o_orderdate, '%Y-%m-%d')    AS cancel_date
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def dwd_trade_order_cancel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdTradeOrderCancelDetail (P5): status-transition predicate over
    a CDC update stream (old.order_status=1001 → data=1003,
    DwdTradeOrderCancelDetail.java:48-57). The changelog is
    synthesized from orders; only % 10 keys transition."""
    orders = load_table(spark, sf_dir, "orders")
    new_status = F.when(F.col("o_orderkey") % 10 == 0, "1003").otherwise("1001")
    cdc = orders.select(
        F.lit("gmall").alias("database"),
        F.lit("order_info").alias("table"),
        F.lit("update").alias("type"),
        F.unix_timestamp("o_orderdate").alias("ts"),
        F.create_map(
            F.lit("id"), F.col("o_orderkey").cast("string"),
            F.lit("user_id"), F.col("o_custkey").cast("string"),
            F.lit("order_status"), new_status,
            F.lit("operate_time"), F.date_format("o_orderdate", "yyyy-MM-dd"),
        ).alias("data"),
        F.create_map(F.lit("order_status"), F.lit("1001")).alias("old"),
    )
    cancelled = cdc.filter(
        status_transition_predicate("order_status", "1001", "1003")
    )
    return cancelled.select(
        F.element_at("data", "id").cast("long").alias("id"),
        F.element_at("data", "user_id").cast("long").alias("user_id"),
        F.element_at("data", "operate_time").alias("cancel_date"),
    )


@register(
    "dwd_trade_pay_suc_interval",
    oracle="""
    SELECT o.o_orderkey                          AS order_id,
           l.l_orderkey * 100 + l.l_linenumber   AS detail_id,
           CAST(l.l_extendedprice AS DECIMAL(12,2)) AS amount,
           strftime(o.o_orderdate, '%Y-%m-%d')   AS pay_date,
           strftime(l.l_shipdate, '%Y-%m-%d')    AS ship_date
    FROM orders o
    JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    """,
)
def dwd_trade_pay_suc_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdTradeOrderPaySucDetail (J2): interval join — payment row
    within [detail.ts, detail.ts + bound] on order_id
    (DwdTradeOrderPaySucDetail.java:123-148). Planned as an equi-join
    on the key with the range as a residual filter: shuffles on
    order_id only, never a cartesian."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pay = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("pay_ts"),
    )
    detail = li.select(
        F.col("l_orderkey").alias("order_id"),
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("detail_id"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("amount"),
        F.col("l_shipdate").alias("ship_ts"),
    )
    joined = interval_join(
        pay, detail, key="order_id", left_ts="pay_ts", right_ts="ship_ts",
        lower="0 SECONDS", upper="30 DAYS",
    )
    return joined.select(
        "order_id", "detail_id",
        F.col("amount").cast("double").alias("amount"),
        F.date_format("pay_ts", "yyyy-MM-dd").alias("pay_date"),
        F.date_format("ship_ts", "yyyy-MM-dd").alias("ship_date"),
    )


@register(
    "dwd_comment_dic_lookup",
    oracle="""
    SELECT l.l_orderkey * 100 + l.l_linenumber AS id,
           l.l_returnflag                      AS appraise,
           d.dic_name                          AS appraise_name,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS amount
    FROM lineitem l
    LEFT JOIN (VALUES ('A', 'accepted'), ('N', 'neutral'), ('R', 'returned'))
         AS d(dic_code, dic_name)
      ON l.l_returnflag = d.dic_code
    """,
)
def dwd_comment_dic_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdInteractionCommentInfo (J3): temporal/lookup join FOR
    SYSTEM_TIME AS OF ≈ broadcast stream-static join against the
    current dic snapshot (DwdInteractionCommentInfo.java:53-68);
    base_dic is a literal dim per FIXTURES.md §4."""
    li = load_table(spark, sf_dir, "lineitem")
    dic = spark.createDataFrame(
        [("A", "accepted"), ("N", "neutral"), ("R", "returned")],
        "dic_code string, dic_name string",
    )
    fact = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("id"),
        F.col("l_returnflag").alias("appraise"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("amount"),
    )
    out = lookup_join(fact, dic, fact["appraise"] == dic["dic_code"], "left")
    return out.select("id", "appraise", F.col("dic_name").alias("appraise_name"), "amount")


# ---------------------------------------------------------------------------
# P8 — DwdBaseLog: parse + 5-way split + array explode, as one
# oracle-checkable route-count query.
# ---------------------------------------------------------------------------

def synthesize_log_json(events: DataFrame) -> DataFrame:
    """events → topic_log JSON strings (FIXTURES.md §1.2 shape):
    'error' rows carry err, 'signup' rows carry start, the rest are
    page views; 'view' pages embed k%3 display elements, 'click' pages
    one action (DwdBaseLog.java:82-135's input contract). k derives
    from the numeric in props, so the oracle can re-derive every count
    with regexp_extract alone."""
    k = F.regexp_extract("props", "[0-9]+", 0).cast("int")
    et = F.col("event_type")
    common = F.struct(
        F.concat(F.lit("mid_"), F.col("user_id")).alias("mid"),
        F.col("user_id").cast("string").alias("uid"),
    )
    page = F.when(
        ~et.isin("error", "signup"),
        F.struct(et.alias("page_id"), k.alias("during_time")),
    )
    err = F.when(et == "error", F.create_map(F.lit("code"), k.cast("string")))
    start = F.when(et == "signup", F.create_map(F.lit("entry"), F.lit("icon")))
    displays = F.when(
        et == "view",
        F.array_repeat(F.create_map(F.lit("pos_id"), F.lit("1")), k % 3),
    )
    actions = F.when(
        et == "click",
        F.array(F.create_map(F.lit("action_id"), F.lit("favor"))),
    )
    payload = F.struct(
        common.alias("common"), page.alias("page"), start.alias("start"),
        err.alias("err"), displays.alias("displays"), actions.alias("actions"),
        (F.unix_timestamp("ts") * 1000).alias("ts"),
    )
    return events.select(F.to_json(payload).alias("value"))


@register(
    "dwd_log_split",
    oracle="""
    SELECT 'err' AS route, count(*) AS cnt FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT 'start', count(*) FROM events WHERE event_type = 'signup'
    UNION ALL
    SELECT 'page', count(*) FROM events WHERE event_type NOT IN ('error', 'signup')
    UNION ALL
    SELECT 'display', CAST(COALESCE(SUM(CAST(regexp_extract(props, '[0-9]+') AS INT) % 3), 0) AS BIGINT)
    FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT 'action', count(*) FROM events WHERE event_type = 'click'
    """,
)
def dwd_log_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdBaseLog (P1+P8+U4): raw JSON log → parse with TOPIC_LOG
    schema (malformed → dropped) → 5-way side-output split with
    display/action explode (DwdBaseLog.java:82-135; the split emits
    array *elements*, fixing the reference's whole-array quirk, SURVEY
    §7.5.2).

    Route cardinalities come from ONE conditional-aggregation scan of
    the parsed stream (routes are disjoint predicates; exploded-route
    counts are sum(size(array))). A per-route `.agg()` union would
    re-synthesize + re-parse the JSON five times — 5 scans for a
    5-route split (16 s → 3 s at sf0.1). The materializing form of the
    split (5 real outputs, one cached pass) is split_log_stream +
    streaming/sinks.split_sink, exercised by the unit and streaming
    tests."""
    from ..operators.etl import parse_json_stream
    from ..schemas import TOPIC_LOG

    events = fan_out(load_table(spark, sf_dir, "events"))
    parsed = parse_json_stream(synthesize_log_json(events), TOPIC_LOG)
    is_err = F.col("err").isNotNull()
    is_start = F.col("err").isNull() & F.col("start").isNotNull()
    is_page = F.col("err").isNull() & F.col("start").isNull()
    one = F.lit(1).cast("long")
    agg = parsed.agg(
        F.sum(F.when(is_err, one).otherwise(0)).alias("err"),
        F.sum(F.when(is_start, one).otherwise(0)).alias("start"),
        F.sum(F.when(is_page, one).otherwise(0)).alias("page"),
        F.sum(F.when(is_page, F.coalesce(F.size("displays"), F.lit(0))).otherwise(0))
        .cast("long").alias("display"),
        F.sum(F.when(is_page, F.coalesce(F.size("actions"), F.lit(0))).otherwise(0))
        .cast("long").alias("action"),
    )
    return agg.selectExpr(
        "stack(5, 'err', err, 'start', start, 'page', page, "
        "'display', display, 'action', action) AS (route, cnt)"
    )


# ---------------------------------------------------------------------------
# J4 (table:type keyed) — DwdBaseDb: config-driven routing of business
# CDC rows to DWD fact topics, with column pruning.
# ---------------------------------------------------------------------------

#: table_process_dwd rows (TableProcessDwd.java:10-24): route is keyed
#: by (source_table, source_type) — the same change stream fans out to
#: different facts depending on the op type (DwdBaseDb.java:79-129).
DWD_CONFIG = [
    ("orders", "bootstrap-insert", "dwd_order_info",
     "o_custkey,o_orderkey,o_orderstatus"),
    ("orders", "update", "dwd_order_update",
     "o_orderkey,o_orderpriority"),
    ("lineitem", "bootstrap-insert", "dwd_order_detail_db",
     "l_linenumber,l_orderkey,l_partkey,l_quantity"),
]


def _dwd_db_oracle_sql() -> str:
    selects = []
    for table, typ, sink_table, sink_columns in DWD_CONFIG:
        cols = sorted(sink_columns.split(","))
        kv = " || ',' || ".join(
            f"'{c}=' || CAST({'o_custkey*2' if (typ == 'update' and c == 'o_custkey') else c} AS VARCHAR)"
            for c in cols
        )
        ts_col = "o_orderdate" if table == "orders" else "l_shipdate"
        off = 1 if typ == "update" else 0
        where = "" if typ != "update" else f"WHERE {'o_orderkey' if table == 'orders' else 'l_orderkey'} % 10000 < 500"
        selects.append(f"""
        SELECT '{sink_table}' AS sink_table, '{typ}' AS op,
               CAST(epoch({ts_col}) + {off} AS BIGINT) AS ts, {kv} AS kv
        FROM {table} {where}""")
    return "\nUNION ALL\n".join(selects)


@register("dwd_base_db_routing", oracle=_dwd_db_oracle_sql())
def dwd_base_db_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdBaseDb (J4 keyed by table:type + P6 + K2): broadcast the
    (source_table, source_type)-keyed config into the CDC stream,
    prune each row's data map to sink_columns, tag with the dynamic
    destination (DwdBaseDb.java:79-145). The downstream K2 sink is one
    partitioned write on sink_table (streaming/sinks.route_by_column).
    Output serialized as the hash-stable sorted k=v string."""
    from ..schemas import TABLE_PROCESS_DWD
    from ..sources.cdc import changelog

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    changes = changelog(orders, "orders", "o_orderkey", "o_orderdate",
                        "o_custkey").unionByName(
        changelog(li, "lineitem", "l_orderkey", "l_shipdate", "l_quantity")
    )
    config = spark.createDataFrame(
        [(t, typ, sink, cols, "r") for t, typ, sink, cols in DWD_CONFIG],
        TABLE_PROCESS_DWD,
    )
    cfg = F.broadcast(config)
    joined = changes.join(
        cfg,
        (changes["table"] == cfg["source_table"])
        & (changes["type"] == cfg["source_type"]),
        "inner",
    )
    cols = F.split(F.col("sink_columns"), ",")
    pruned = F.map_filter("data", lambda k, v: F.array_contains(cols, k))
    d = pruned
    kv = F.array_join(
        F.transform(
            F.array_sort(F.map_keys(d)),
            lambda k: F.concat(k, F.lit("="), F.element_at(d, k)),
        ),
        ",",
    )
    return joined.select(
        "sink_table", F.col("type").alias("op"), "ts", kv.alias("kv")
    )
