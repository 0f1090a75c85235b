"""Decision-support join shapes, batch 2 (round 4 continuation).

Completes the TPC-H-pattern coverage started in `plans/classics.py`
(which closed Q2/Q15/Q17/Q18/Q19/Q21/Q22): the remaining classic
shapes a user of the reference warehouse (its DWS layer joins facts
to dims and aggregates — e.g. reference
`DwsTradeProvinceOrderWindow.java`, `DwsTradeSkuOrderWindow.java`)
would run for decision support, each re-planned for 100 TB:

- returned_items_report (Q10 shape): returned-revenue top customers.
  The dim enrichment joins AFTER the rollup+limit — 20 rows probe
  the broadcast customer/nation dims instead of every fact row.
- late_shipment_priority_counts (Q4/Q12 hybrid shape): EXISTS(late
  lineitem) becomes a per-order bool_or rollup that REUSES the
  orderkey partitioning of the lineitem⋈orders join — the
  correlated subquery costs zero extra shuffles.
- nation_pair_trade_volume (Q7 shape): both dims are filtered to
  the two target nations FIRST and broadcast, so the fact scans are
  pruned map-side and the only shuffle is the lineitem⋈orders
  orderkey exchange.
- market_share_by_year (Q8 shape): the "share of one nation"
  numerator is a conditional sum inside the same rollup as the
  denominator — one aggregate, no self-join of the revenue CTE.
- product_profit_by_nation_year (Q9 shape, adapted): the testdata
  has no partsupp table (TESTDATA.md), so supply cost is restated
  as 50% of p_retailprice — the join SHAPE (part name filter
  broadcast into the fact, supplier nation attribution, per
  nation×year profit rollup) is the thing under test; documented
  adaptation, the oracle states the identical formula.
- copurchase_part_pairs (market-basket shape): within-order part
  pair counts. The self-join is keyed on l_orderkey whose group
  size is bounded by lines-per-order (≤ 7 in TPC-H), so the pair
  expansion is a constant factor of the fact, never quadratic in
  the table.
- trend_fit_daily_revenue: closed-form OLS per year over the daily
  revenue rollup — power sums are decimal-exact, the slope is ONE
  stabilized double division, and the regression runs over ≤ 366
  rows per year, not the fact table.

Dates/filters are adapted to the driver testdata's domain (orderdates
1995-2001, no l_shipmode/l_commitdate/partsupp — TESTDATA.md); the
join/subquery SHAPE is the thing under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register


def _rev(price_col: str = "l_extendedprice",
         disc_col: str = "l_discount"):
    """Decimal-exact extended revenue term (repo-wide discipline)."""
    return (F.col(price_col).cast("decimal(12,2)")
            * (F.lit(1) - F.col(disc_col)).cast("decimal(3,2)"))


# ---------------------------------------------------------------------------
# Q10 shape — returned-item revenue report (top customers)
# ---------------------------------------------------------------------------

@register(
    "returned_items_report",
    oracle="""
    WITH returned AS (
        SELECT o.o_custkey AS custkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                    AS DOUBLE) AS lost_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_returned_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate <  DATE '1996-07-01'
        GROUP BY 1
        ORDER BY lost_revenue DESC, custkey
        LIMIT 20
    )
    SELECT r.custkey, c.c_name, n.n_name, r.lost_revenue,
           r.n_returned_lines
    FROM returned r
    JOIN customer c ON r.custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    ORDER BY r.lost_revenue DESC, r.custkey
    """,
)
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in
    a half-year. Scale plan: the returnflag + orderdate predicates
    reach the parquet scans; lineitem⋈orders shuffles once on
    orderkey; the custkey rollup is TakeOrdered to 20 rows BEFORE
    the customer/nation enrichment joins — so the dims are probed by
    20 rows, not 100 TB of facts (same enrich-after-aggregate
    discipline as `plans/dws.dws_sku_order_window`). Ties break on
    custkey in both engines so the LIMIT boundary is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    top = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(_rev()).cast("double").alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.col("lost_revenue").desc(), "custkey")
        .limit(20)
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    return (
        top.join(F.broadcast(c), top["custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .orderBy(F.col("lost_revenue").desc(), "custkey")
        .select("custkey", "c_name", "n_name", "lost_revenue",
                "n_returned_lines")
    )


# ---------------------------------------------------------------------------
# Q4/Q12 hybrid shape — late-shipment order counts per priority
# ---------------------------------------------------------------------------

@register(
    "late_shipment_priority_counts",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS late_order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate <  DATE '1998-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def late_shipment_priority_counts(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (latency predicate standing in for the absent
    l_commitdate): count 1997 orders per priority having at least
    one lineitem shipped more than 90 days after order date. The
    correlated EXISTS becomes a per-order bool_or rollup that reuses
    the orderkey partitioning of the lineitem⋈orders join — zero
    extra fact shuffles (same fused-rollup discipline as
    `classics.waiting_orders_by_supplier`); the final groupBy runs
    over |orders-in-window| rows, and the priority domain bounds the
    output at 5 rows. The oracle keeps the original correlated
    EXISTS form, so the gate proves the rewrite equivalent."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS")
    per_order = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.first("o_orderpriority").alias("priority"),
            F.max(late.cast("int")).alias("any_late"),
        )
    )
    return (
        per_order.filter(F.col("any_late") == 1)
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("late_order_count"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Q7 shape — bilateral trade volume between two nations
# ---------------------------------------------------------------------------

@register(
    "nation_pair_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_pair_trade_volume(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: yearly shipped revenue between two nations, in
    both directions. Scale plan: supplier and customer are each
    FILTERED to the two target nations before anything touches a
    fact — at 2/25 selectivity the filtered dims broadcast, so both
    fact scans are pruned map-side (lineitem by supp nation, orders
    by cust nation) and the only shuffle left is the
    lineitem⋈orders orderkey exchange over the ~0.6% of facts that
    survive both prunes. The direction predicate is a post-join
    filter over two broadcast-resolved names — no re-shuffle."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(pair)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(pair)),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            ((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share within a region for a product type
# ---------------------------------------------------------------------------

@register(
    "market_share_by_year",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l.l_discount AS DECIMAL(3,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END)
                AS DOUBLE) AS nation_volume,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                AS DOUBLE) AS total_volume,
           round(CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
                          THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                               * CAST(1 - l.l_discount AS DECIMAL(3,2))
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                     AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
    GROUP BY 1
    ORDER BY 1
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's yearly share of PROMO-part revenue
    sold into ASIA. Scale plan: the type-filtered part dim and the
    supplier dim broadcast into the lineitem scan (1/6 of facts
    survive the part prune map-side); the region→nation→customer
    broadcast chain prunes orders to ASIA customers before the
    orderkey exchange — so the one unavoidable fact shuffle
    (lineitem⋈orders) moves only the doubly-pruned ~3% of rows.
    Numerator and denominator are conditional sums in the SAME
    rollup — no revenue-CTE self-join, no second pass; the share is
    one stabilized double division on ≤ |years| rows."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey")
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    target = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(zero)
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.sum(target).cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
    )
    return agg.select(
        "order_year", "nation_volume", "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6)
        .alias("mkt_share"),
    ).orderBy("order_year")


# ---------------------------------------------------------------------------
# Q9 shape (adapted) — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

@register(
    "product_profit_by_nation_year",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(3,2))
                    - CAST(0.5 AS DECIMAL(3,2))
                      * CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2)))
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%green%'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def product_profit_by_nation_year(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, adapted: profit on green parts per supplier
    nation per year. The testdata has no partsupp table
    (TESTDATA.md), so supply cost is restated as 50% of
    p_retailprice — a documented adaptation; the oracle states the
    identical formula, and the join SHAPE (name-filtered part
    broadcast into the fact scan, supplier→nation attribution
    chain, nation×year rollup) is what's under test. Scale plan:
    part-name LIKE prunes the part dim before broadcast (~1/8 of
    parts), the pruned part + supplier dims broadcast into the
    lineitem scan, and the one fact shuffle is the orderkey
    exchange; profit stays decimal until the final cast so every
    engine sums the same grid."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%green%")
    ).select("p_partkey", "p_retailprice")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    profit = (
        _rev()
        - F.lit(0.5).cast("decimal(3,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("supp_nation", "order_year")
    )


# ---------------------------------------------------------------------------
# Market-basket shape — within-order co-purchased part pairs
# ---------------------------------------------------------------------------

@register(
    "copurchase_part_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: the most frequently co-ordered part
    pairs (support ≥ 2 orders). Scale plan: the self-join is keyed
    on l_orderkey, whose group size is bounded by lines-per-order
    (≤ 7 in TPC-H) — the pair expansion is a CONSTANT factor of the
    fact table, never |parts|² — and the distinct projection
    shuffles only (orderkey, partkey). Both join sides share the
    orderkey exchange; pair counts TakeOrdered to 20 with full
    column tiebreak so the LIMIT boundary is deterministic.
    Reference anchor: keyword/co-occurrence counting is the
    reference's DwsTrafficSourceKeywordPageViewWindow.java pattern
    lifted from tokens to basket items."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Per-group closed-form OLS — daily revenue trend per year
# ---------------------------------------------------------------------------

@register(
    "trend_fit_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders
        GROUP BY 1, 2
    )
    SELECT order_year,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(30,2)) * y)
                      - SUM(x) * SUM(y) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
                        AS DOUBLE), 6) AS slope,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*)
                 - (CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(30,2)) * y)
                         - SUM(x) * SUM(y) AS DOUBLE)
                    / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
                           AS DOUBLE))
                   * (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 6)
               AS intercept
    FROM daily
    GROUP BY 1
    ORDER BY 1
    """,
)
def trend_fit_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year OLS trend of daily order revenue — closed-form least
    squares (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)) computed from
    decimal-exact power sums, the grouped-regression primitive a
    warehouse runs per segment at 100 TB. Scale plan: ONE map-side-
    combined rollup to (year, day) — ≤ 366 rows per year — then the
    regression arithmetic runs on the tiny rollup; power sums stay
    integer/decimal (x is a day ordinal, y a decimal sum) so both
    engines divide the SAME exact numerator/denominator, and the
    only doubles are the two final stabilized divisions."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.dayofyear("o_orderdate").cast("long").alias("x"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    xy = F.col("x").cast("decimal(30,2)") * F.col("y")
    fit = daily.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(xy).alias("sxy"),
    )
    num = (F.col("n_days") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n_days") * F.col("sxx")
           - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") / F.col("n_days")
                 - slope * (F.col("sx").cast("double") / F.col("n_days")))
    return fit.select(
        "order_year", "n_days",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    ).orderBy("order_year")


# ---------------------------------------------------------------------------
# Streaming twin — market share maintained as a continuous aggregate
# ---------------------------------------------------------------------------

@register(
    "stream_market_share_by_year",
    tier="variant",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l.l_discount AS DECIMAL(3,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END)
                AS DOUBLE) AS nation_volume,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                AS DOUBLE) AS total_volume,
           round(CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
                          THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                               * CAST(1 - l.l_discount AS DECIMAL(3,2))
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                     AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_market_share_by_year(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Market share (Q8 shape) as a continuous aggregate: lineitem
    facts arrive as micro-batches, each batch joins the static dims
    (stream-static broadcast, reference J3 shape) and reduces to
    per-year (nation_volume, total_volume) DECIMAL partials — both
    commutative monoids — which merge exactly-once into the stored
    table; the ratio is derived AT READ from the exact partials, so
    the stored table equals the batch twin whatever the batch
    boundaries, and a dashboard re-reads the share without ever
    rescanning history. Same oracle as `market_share_by_year`."""
    import os
    import tempfile

    from ..streaming.runner import run_foreach_batch, staged_files_dir
    from ..streaming.sinks import additive_merge_batch
    from .streaming_queries import _stage_once

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey")
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    in_dir = _stage_once(
        sf_dir, "mkt_share_lineitem",
        lambda base: staged_files_dir(li, base, n_files=3,
                                      order_col="l_orderkey"),
    )
    rundir = tempfile.mkdtemp(prefix="rdw_streamq_mktshare_")
    table_dir = os.path.join(rundir, "share")

    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    target = F.when(F.col("supp_nation") == "NATION_7",
                    vol).otherwise(zero)

    def share_partials(batch: DataFrame) -> DataFrame:
        return (
            batch
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(orders),
                  batch.l_orderkey == orders.o_orderkey)
            .groupBy(F.year("o_orderdate").cast("int")
                     .alias("order_year"))
            .agg(
                F.sum(target).alias("nation_vol_partial"),
                F.sum(vol).alias("total_vol_partial"),
            )
        )

    sdf = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    run_foreach_batch(
        sdf,
        additive_merge_batch(
            table_dir, keys=["order_year"],
            sum_cols=["nation_vol_partial", "total_vol_partial"],
            prepare=share_partials,
        ),
        checkpoint_dir=os.path.join(rundir, "ck"),
        output_mode="append",
    )
    stored = spark.read.parquet(table_dir)
    return stored.select(
        "order_year",
        F.col("nation_vol_partial").cast("double").alias("nation_volume"),
        F.col("total_vol_partial").cast("double").alias("total_volume"),
        F.round(F.col("nation_vol_partial").cast("double")
                / F.col("total_vol_partial").cast("double"), 6)
        .alias("mkt_share"),
    ).orderBy("order_year")


# ---------------------------------------------------------------------------
# Streaming twin — OLS trend maintained from additive power sums
# ---------------------------------------------------------------------------

@register(
    "stream_trend_fit_daily_revenue",
    tier="variant",
    oracle="""
    WITH daily AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders
        GROUP BY 1, 2
    )
    SELECT order_year,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(30,2)) * y)
                      - SUM(x) * SUM(y) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
                        AS DOUBLE), 6) AS slope,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*)
                 - (CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(30,2)) * y)
                         - SUM(x) * SUM(y) AS DOUBLE)
                    / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
                           AS DOUBLE))
                   * (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 6)
               AS intercept
    FROM daily
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_trend_fit_daily_revenue(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Per-year OLS trend as a stream: every regression power sum
    (n, Σx, Σx², Σy, Σxy) is a commutative monoid, so the model is a
    CONTINUOUS AGGREGATE — each micro-batch reduces to per-(year,
    day) partials, merges exactly-once into the maintained daily
    rollup (keyed on (year, day): a day split across batches re-sums
    its decimal y exactly), and slope/intercept are DERIVED AT READ
    from the stored rollup. Retraining on new data costs one
    micro-batch merge, never a history rescan — the streaming-ML
    shape of `trend_fit_daily_revenue`, same oracle.

    Caveat shared with the batch twin: x is the day-of-year ordinal,
    so the fit is per-calendar-year and the rollup is ≤ 366 rows per
    year — driver-safe model size at any data scale."""
    import os
    import tempfile

    from ..streaming.runner import run_foreach_batch, staged_files_dir
    from ..streaming.sinks import additive_merge_batch
    from .streaming_queries import _stage_once

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice")
    in_dir = _stage_once(
        sf_dir, "trend_orders",
        lambda base: staged_files_dir(o, base, n_files=3,
                                      order_col="o_orderkey"),
    )
    rundir = tempfile.mkdtemp(prefix="rdw_streamq_trend_")
    table_dir = os.path.join(rundir, "daily")

    def daily_partials(batch: DataFrame) -> DataFrame:
        return (
            batch.groupBy(
                F.year("o_orderdate").cast("int").alias("order_year"),
                F.dayofyear("o_orderdate").cast("long").alias("x"),
            )
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .alias("y"))
        )

    sdf = (
        spark.readStream.schema(o.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    )
    run_foreach_batch(
        sdf,
        additive_merge_batch(table_dir, keys=["order_year", "x"],
                             sum_cols=["y"], prepare=daily_partials),
        checkpoint_dir=os.path.join(rundir, "ck"),
        output_mode="append",
    )

    daily = spark.read.parquet(table_dir)
    xy = F.col("x").cast("decimal(30,2)") * F.col("y")
    fit = daily.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(xy).alias("sxy"),
    )
    num = (F.col("n_days") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n_days") * F.col("sxx")
           - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") / F.col("n_days")
                 - slope * (F.col("sx").cast("double") / F.col("n_days")))
    return fit.select(
        "order_year", "n_days",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    ).orderBy("order_year")


# ---------------------------------------------------------------------------
# Q6 shape — forecast revenue change (pure pushdown aggregate)
# ---------------------------------------------------------------------------

@register(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
               AS potential_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate <  DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase if mid-range discounts were
    dropped — the canonical pure-pushdown aggregate. All four
    predicates (shipdate range, discount band, quantity cap) reach
    the parquet scan as PushedFilters, so row groups outside the
    date/discount envelope never decompress; the plan is scan →
    partial agg → single-row exchange, zero joins, the cheapest
    possible shape at any scale (plan-pinned). Discount multiplies
    as decimal so the single output row is grid-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")
              * F.col("l_discount").cast("decimal(3,2)"))
        .cast("double").alias("potential_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
