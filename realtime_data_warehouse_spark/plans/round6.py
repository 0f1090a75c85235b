"""Round-6 additions (appended LAST in plans/registry.py so every
earlier round's driver-gate prefix is untouched — append-only
registry discipline).

Entries:
- ann_lsh_recall: recall/cost calibration of the sign-LSH retriever
  against exact ground truth across bucket widths AND table counts
  (VERDICT r5 item 4 — lsh_topk's default was the one ANN path with
  no measured recall).
- stream_order_wide_join: the reference's 4-way order-wide join chain
  as chained stream-stream joins (VERDICT r5 item 6).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.batch import fan_out, load_table
from .registry import register


def _vb_sql(off: int) -> str:
    """Unrolled sign-LSH bucket for hash table `off` — generated so
    the oracle's coordinate positions come from the same (bits=8,
    stride=8, offset) convention operators/similarity.lsh_sign_bucket
    implements (embedding[] is 1-based in DuckDB)."""
    terms = " + ".join(
        f"CASE WHEN embedding[{i * 8 + off + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(8)
    )
    return (
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, "
        f"({terms}) AS bucket FROM embeddings"
    )


def _multi_cand_sql(n_tables: int) -> str:
    unions = " UNION ALL ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id "
        f"FROM vb{t} q JOIN vb{t} c "
        f"ON c.vec_id <> q.vec_id AND c.bucket = q.bucket "
        f"WHERE q.vec_id < 10"
        for t in range(n_tables)
    )
    return (
        f"SELECT DISTINCT query_id, neighbor_id, 8 AS bits, "
        f"{n_tables} AS n_tables FROM ({unions})"
    )


_COS6 = (
    "round(list_inner_product(q.e, c.e)"
    " / sqrt(list_inner_product(q.e, q.e)"
    " * list_inner_product(c.e, c.e)), 6)"
)

_LSH_RECALL_ORACLE = f"""
    WITH vb0 AS ({_vb_sql(0)}), vb1 AS ({_vb_sql(1)}),
         vb2 AS ({_vb_sql(2)}), vb3 AS ({_vb_sql(3)}),
    bitsets AS (SELECT * FROM (VALUES (2), (4), (6), (8)) AS t(bits)),
    brute AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM vb0 q JOIN vb0 c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id ORDER BY {_COS6} DESC, c.vec_id
        ) <= 5
    ),
    -- single-table width sweep: the b-bit bucket is the LOW b bits
    -- of table 0's 8-bit bucket (bit i reads coordinate i*stride)
    cand1 AS (
        SELECT b.bits, 1 AS n_tables,
               q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM bitsets b
        CROSS JOIN vb0 q
        JOIN vb0 c
          ON c.vec_id <> q.vec_id
         AND (c.bucket & ((1 << b.bits) - 1))
             = (q.bucket & ((1 << b.bits) - 1))
        WHERE q.vec_id < 10
    ),
    cand AS (
        SELECT * FROM cand1
        UNION ALL SELECT bits, n_tables, query_id, neighbor_id
                  FROM ({_multi_cand_sql(2)})
        UNION ALL SELECT bits, n_tables, query_id, neighbor_id
                  FROM ({_multi_cand_sql(4)})
    ),
    scored AS (
        SELECT cd.bits, cd.n_tables, cd.query_id, cd.neighbor_id,
               {_COS6} AS cos6
        FROM cand cd
        JOIN vb0 q ON q.vec_id = cd.query_id
        JOIN vb0 c ON c.vec_id = cd.neighbor_id
    ),
    lsh AS (
        SELECT bits, n_tables, query_id, neighbor_id FROM scored
        QUALIFY row_number() OVER (
            PARTITION BY bits, n_tables, query_id
            ORDER BY cos6 DESC, neighbor_id
        ) <= 5
    ),
    -- every config comes from this static list, LEFT-joined to its
    -- candidates: a (bits, n_tables) whose bucket join finds NOTHING
    -- (possible on a small or skewed corpus) must still yield a row
    -- with n_candidates = 0, matching the Spark side's unconditional
    -- six-row output — driving rec/ncand off cand alone would drop it
    configs AS (
        SELECT * FROM (VALUES (2, 1), (4, 1), (6, 1), (8, 1),
                              (8, 2), (8, 4)) AS t(bits, n_tables)
    ),
    ncand AS (
        SELECT g.bits, g.n_tables,
               CAST(count(c.query_id) AS BIGINT) AS n_candidates
        FROM configs g
        LEFT JOIN cand c ON c.bits = g.bits AND c.n_tables = g.n_tables
        GROUP BY 1, 2
    ),
    rec AS (
        SELECT g.bits, g.n_tables,
               CAST(count(*) AS BIGINT)             AS k_total,
               CAST(count(l.neighbor_id) AS BIGINT) AS n_matched
        FROM configs g
        CROSS JOIN brute t
        LEFT JOIN lsh l ON l.bits = g.bits AND l.n_tables = g.n_tables
                       AND l.query_id = t.query_id
                       AND l.neighbor_id = t.neighbor_id
        GROUP BY 1, 2
    )
    SELECT r.bits, r.n_tables, r.k_total, r.n_matched,
           round(r.n_matched / CAST(r.k_total AS DOUBLE), 6) AS recall,
           n.n_candidates
    FROM rec r JOIN ncand n USING (bits, n_tables)
"""


@register("ann_lsh_recall", oracle=_LSH_RECALL_ORACLE)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH retriever calibration (the ann_recall_report methodology
    extended to lsh_topk, which until round 6 was the one approximate
    path with no measured recall): recall@5 against exact brute-force
    ground truth AND the candidate-scan cost, for single-table widths
    b ∈ {2,4,6,8} and multi-table OR-amplification (bits=8, L ∈
    {2,4}) over the same probe set the other ANN entries use.
    recall = matched@5 / (5·|probes|); n_candidates = distinct
    same-bucket pairs scanned — the two axes of the recall/cost trade.

    Measured law (sf0.1, in lsh_topk's docstring): a bucket agrees on
    a true neighbor at angle θ w.p. (1−θ/π)^bits per table. The
    driver corpus is ISOTROPIC (exact top-5 at cos ≈ 0.4 ⇒ p₈ ≈ 0.02
    — measured recall 0.00-0.28 tracking candidate fraction, no hash
    family can beat that geometry), while the near-dup regime the
    operator serves (cos ≥ 0.9) gives p ≈ 0.4/table and L=4 ≈ 0.87.
    The entry IS the per-corpus tuning loop; candidate-set cuts use
    the round-6-stable rounded-cosine convention on both sides.

    Scale: ground truth is probe-bounded (broadcast probes × one
    corpus scan); every config's candidates come from the same bucket
    equi-joins lsh_topk runs — no new join shape.

    r12 restructure (guide §1.2 step 1 — the distributed algorithm
    first): every config's candidate set is a PREDICATE over the same
    (probe × corpus) pair space — config (b, 1) collides iff the low
    b bits of the offset-0 8-bit buckets agree; (8, L) iff ANY of the
    first L offsets' full buckets agree — and the brute-force truth
    ranks that same pair space. So the whole entry is ONE scored
    cross join (probes broadcast), persisted, consumed three ways:
    the brute top-5 window, a 6-config posexplode → per-config top-5
    window, and the per-config candidate counts. Before: 6 lsh_topk
    subplans + 6 bucket-join count subplans + 6 per-config dimension
    probes unioned into a 3,000-line plan (264 Exchanges, 19 BNLJ
    after the r12 brute persist) — 12 corpus re-scans and six
    driver-side first() calls inside the timed region. After: 2
    corpus scans, 2 windows, zero BNLJ. Candidate sets, scoring
    expression (same dot/norm2 folds) and the rank_rounded tie-break
    are UNCHANGED per config, so the six output rows are identical —
    oracle-verified at sf0.01/sf0.001 and hash-identical at sf0.1."""
    from ..cache import persisted

    CONFIGS = ((2, 1), (4, 1), (6, 1), (8, 1), (8, 2), (8, 4))
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    # the dim guard lsh_topk ran per config (6 identical first()
    # probes) — checked once, DERIVED from CONFIGS (ADVICE r12 #1: a
    # hardcoded widest-config constant under-checks if CONFIGS ever
    # widens, and an out-of-range element_at would silently NULL the
    # high bucket bits): config (bits=b, tables=L) reads coordinate
    # (b-1)*stride + (L-1) with stride 8.
    need = max((b - 1) * 8 + (tl - 1) + 1 for b, tl in CONFIGS)
    row = emb.select(F.size(S.as_double("embedding")).alias("d")).first()
    if row is not None and row["d"] < need:
        raise ValueError(
            f"ann_lsh_recall reads coordinate {need - 1}; corpus "
            f"embeddings have dim {row['d']} — bucket bits beyond the "
            f"vector would silently collapse.")

    def side(df, out_id: str, pfx: str):
        d = df.select(F.col("vec_id").alias(out_id),
                      S.as_double("embedding").alias(f"{pfx}v"))
        d = d.withColumn(f"{pfx}n", S.norm2(F.col(f"{pfx}v")))
        for t in range(4):
            d = d.withColumn(
                f"{pfx}b{t}",
                S.lsh_sign_bucket(F.col(f"{pfx}v"), 8, 8, t))
        return d

    q = side(queries, "query_id", "q")
    c = side(emb, "neighbor_id", "c")
    pairs = c.join(F.broadcast(q),
                   F.col("neighbor_id") != F.col("query_id"))

    def collide(bits: int, n_tables: int) -> F.Column:
        if n_tables == 1:
            mask = F.lit((1 << bits) - 1)
            return (F.col("cb0").bitwiseAND(mask)
                    == F.col("qb0").bitwiseAND(mask))
        flag = None
        for t in range(n_tables):
            eq = F.col(f"cb{t}") == F.col(f"qb{t}")
            flag = eq if flag is None else (flag | eq)
        return flag

    scored = persisted(pairs.select(
        "query_id", "neighbor_id",
        (S.dot(F.col("qv"), F.col("cv"))
         / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        *[collide(b, L).alias(f"m_{b}_{L}") for b, L in CONFIGS],
    ))

    brute5 = S._topk_cut(scored, 5, rank_rounded=True).select(
        "query_id", "neighbor_id")

    cfg = F.explode(F.array(*[
        F.struct(F.lit(b).alias("bits"), F.lit(L).alias("n_tables"),
                 F.col(f"m_{b}_{L}").alias("m"))
        for b, L in CONFIGS])).alias("cfg")
    cand = (scored.select("query_id", "neighbor_id", "cos_sim", cfg)
            .select("query_id", "neighbor_id", "cos_sim",
                    "cfg.bits", "cfg.n_tables", "cfg.m")
            .filter(F.col("m")))
    w = Window.partitionBy("bits", "n_tables", "query_id").orderBy(
        F.round("cos_sim", 6).desc(), F.col("neighbor_id"))
    lsh5 = (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("bits", "n_tables", "query_id",
                    F.col("neighbor_id").alias("lsh_neighbor")))

    configs_df = spark.createDataFrame(list(CONFIGS),
                                       "bits int, n_tables int")
    rec = (configs_df.crossJoin(brute5).alias("t")
           .join(lsh5.alias("l"),
                 (F.col("t.bits") == F.col("l.bits"))
                 & (F.col("t.n_tables") == F.col("l.n_tables"))
                 & (F.col("t.query_id") == F.col("l.query_id"))
                 & (F.col("t.neighbor_id") == F.col("l.lsh_neighbor")),
                 "left")
           .groupBy("t.bits", "t.n_tables")
           .agg(F.count(F.lit(1)).alias("k_total"),
                F.count("l.lsh_neighbor").alias("n_matched")))
    ncand = (configs_df.alias("g")
             .join(cand.groupBy("bits", "n_tables")
                   .agg(F.count(F.lit(1)).alias("__nc")).alias("n"),
                   ["bits", "n_tables"], "left")
             .select("bits", "n_tables",
                     F.coalesce("__nc", F.lit(0)).alias("n_candidates")))
    return (rec.join(ncand, ["bits", "n_tables"])
            .select("bits", "n_tables", "k_total", "n_matched",
                    F.round(F.col("n_matched")
                            / F.col("k_total").cast("double"), 6)
                    .alias("recall"),
                    "n_candidates"))


# ---------------------------------------------------------------------------
# J1's FULL 4-way order-wide join as chained stream-stream joins
# ---------------------------------------------------------------------------

@register(
    "stream_order_wide_join",
    tier="variant",
    # Same relational answer as the batch dwd_trade_order_detail entry
    # (one oracle family, two physical paths — stream ≡ batch ≡ SQL).
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
def stream_order_wide_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL 4-way order-wide chain
    (DwdTradeOrderDetail.java:68-92: detail ⋈ order ⟕ activity ⟕
    coupon, idle-state TTL 5-15 s) as CHAINED STREAM-STREAM JOINS —
    round-6 closure of the gap where only the 2-way LEFT interval
    join ran as a stream. All four inputs replay as independent
    file streams split into 3 time-ordered micro-batches each, so
    every join must match rows across batch boundaries from state.

    Event-time model: each CDC row carries its transaction's commit
    time — the order's o_orderdate — as all four streams' ts (the
    reference joins changelog topics of one DB transaction, which is
    why its 5 s TTL works). Each hop is a windowed equi join with a
    ±1 h bound: the bound IS the TTL (state for a row is evicted once
    the other side's watermark passes its window), so per-key state
    is rate×2 h, not the stream's history. LEFT hops emit their null
    rows only when the watermark PROVES no match can arrive; one
    far-future sentinel per input advances the min-policy watermark
    so availableNow's final no-data batch flushes every outer state
    (same discipline as stream_left_interval_join).

    Scale: three stateful joins all keyed on order-derived ids — the
    order_id hash co-locates hop 1, the detail-id hops reuse that
    partitioning; state bounded by the window on every hop. MEASURED
    (round 7, SCALING.md `stream_order_wide`): the same chain on
    `synthetic_order_wide` drains FLAT at 36-38 s from 30k to 1M
    orders (33×, 2.2M input rows at the top size) with the exact
    expected output — n rows, ⌈n/7⌉ activity and ⌈n/11⌉ coupon
    matches — asserted at every size; the drain cost is the
    micro-batch × 3-hop state-store commit machinery, not per-row
    work, so this entry's sf0.1 wall time is a floor, not a rate."""
    from ..streaming.joins import windowed_equi_join
    from ..streaming.runner import (
        pinned_shuffle,
        read_back,
        run_available_now,
        shuffle_for_volume,
        staged_batch_rows,
    )
    from .streaming_queries import _stage_once

    rundir = tempfile.mkdtemp(prefix="rdw_streamq_owj_")
    out, ck = os.path.join(rundir, "out"), os.path.join(rundir, "ck")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    commit_ts = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    detail = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_quantity").cast("long").alias("sku_num"),
        (price * disc).cast("double").alias("split_total_amount"),
    ).join(commit_ts, "order_id").withColumnRenamed("ts", "d_ts")
    order = orders.select(
        F.col("o_orderkey").alias("o_order_id"),
        F.col("o_custkey").alias("user_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("create_time"),
        F.col("o_orderdate").cast("timestamp").alias("o_ts"),
    )
    activity = li.filter(F.col("l_orderkey") % 7 == 0).select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber"))
        .alias("a_detail_id"),
        (F.col("l_orderkey") % 5).alias("activity_id"),
        F.col("l_orderkey").alias("order_id"),
    ).join(commit_ts, "order_id").select(
        "a_detail_id", "activity_id", F.col("ts").alias("a_ts"))
    coupon = li.filter(F.col("l_orderkey") % 11 == 0).select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber"))
        .alias("c_detail_id"),
        (F.col("l_orderkey") % 3).alias("coupon_id"),
        F.col("l_orderkey").alias("order_id"),
    ).join(commit_ts, "order_id").select(
        "c_detail_id", "coupon_id", F.col("ts").alias("c_ts"))

    def build(base: str):
        import time as _time
        from datetime import timedelta

        # ONE boundary set for all four streams (order-date slices,
        # default terciles): per-stream repartitionByRange would cut
        # at each dataset's own quantiles, so batch k of one stream
        # could span time batch k+1 of another — a row then arrives
        # behind the min-policy watermark and is dropped (measured: 2
        # rows lost at sf0.001). Time-aligned files make batch k cover
        # the same [bk, bk+1) on every input, so nothing is ever late
        # under the 1 h delay. SPARK_GRAFT_OWJ_SLICES (r13) raises the
        # slice count — the trigger-sizing knob the latency SLO ladder
        # measures (smaller per-trigger batches, identical output:
        # slices stay time-ordered so watermark semantics are
        # unchanged; default 3 is the contract the oracle checks).
        row = orders.select(
            F.max("o_orderdate"),
            *[F.expr(f"percentile(unix_timestamp(o_orderdate), "
                     f"{i / slices})") for i in range(1, slices)],
        ).collect()[0]
        mx, cuts = row[0], [row[i] for i in range(1, slices)]
        far = mx + timedelta(days=400)
        dirs = {}
        for name, df, ts_col, sentinel in (
            ("detail", detail, "d_ts", (-2, -2, -2, 0, 0.0, far)),
            ("order", order, "o_ts", (-1, -1, "x", far)),
            ("activity", activity, "a_ts", (-3, -3, far)),
            ("coupon", coupon, "c_ts", (-4, -4, far)),
        ):
            d = os.path.join(base, name, "in")
            ep = F.unix_timestamp(ts_col)
            bounds = [None, *cuts, None]
            parts = []
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (ep >= lo)
                if hi is not None:
                    cond = cond & (ep < hi)
                parts.append(df.filter(cond))
            parts.append(spark.createDataFrame([sentinel], df.schema))
            # FileStreamSource orders by mtime: stamp part files in
            # write order so file i replays as micro-batch i. Write
            # order is RECORDED by diffing the directory listing after
            # each append — inferring it from mtimes afterwards breaks
            # on coarse-mtime filesystems, where ties fall back to the
            # random UUID filename and can re-stamp batches out of
            # time order (rows then drop behind the min watermark).
            def _parts() -> set[str]:
                return {f for f in os.listdir(d)
                        if f.startswith("part-") and f.endswith(".parquet")}

            files, seen = [], set()
            for p in parts:
                p.coalesce(1).write.mode("append").parquet(d)
                new = _parts() - seen
                assert len(new) == 1, f"expected 1 new part file, got {new}"
                files.extend(new)
                seen |= new
            t0 = int(_time.time()) - len(files) - 10
            for i, f in enumerate(files):
                os.utime(os.path.join(d, f), (t0 + i, t0 + i))
            dirs[name] = d
        return dirs

    slices = int(os.environ.get("SPARK_GRAFT_OWJ_SLICES", "3"))
    dirs = _stage_once(
        sf_dir, "owj_4way" if slices == 3 else f"owj_4way_s{slices}", build)

    def stream(name, df, ts_col):
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1").parquet(dirs[name])
            .withWatermark(ts_col, "1 hour")
        )

    s_detail = stream("detail", detail, "d_ts")
    s_order = stream("order", order, "o_ts")
    s_activity = stream("activity", activity, "a_ts")
    s_coupon = stream("coupon", coupon, "c_ts")

    # each hop's output must carry exactly ONE event-time column for
    # the next stateful operator — keep the detail side's d_ts, drop
    # the probed side's watermark column once the hop has used it
    hop1 = windowed_equi_join(
        s_detail, s_order,
        equi=F.col("order_id") == F.col("o_order_id"),
        left_ts="d_ts", right_ts="o_ts", ttl="1 hour", how="inner",
    ).drop("o_order_id", "o_ts")
    hop2 = windowed_equi_join(
        hop1, s_activity,
        equi=F.col("id") == F.col("a_detail_id"),
        left_ts="d_ts", right_ts="a_ts", ttl="1 hour", how="left",
    ).drop("a_detail_id", "a_ts")
    wide = windowed_equi_join(
        hop2, s_coupon,
        equi=F.col("id") == F.col("c_detail_id"),
        left_ts="d_ts", right_ts="c_ts", ttl="1 hour", how="left",
    ).drop("c_detail_id", "c_ts")

    # Three chained stateful joins each keep state in
    # spark.sql.shuffle.partitions stores per micro-batch, and the
    # drain cost of this query is almost ENTIRELY those commits — the
    # round-7 partition ladder measured cost ∝ partitions with
    # identical output (see streaming/runner.pinned_shuffle). The pin
    # is DERIVED from this replay's actual per-batch volume (largest
    # staged part file, footer metadata only — all four sides replay
    # maxFilesPerTrigger=1), not hand-tuned: at sf0.1 (~200k-row
    # detail terciles) this computes the ladder-optimal 8 and carries
    # to 100× the volume without retuning.
    rows_per_batch = max(staged_batch_rows(d) for d in dirs.values())
    with pinned_shuffle(spark, shuffle_for_volume(rows_per_batch)):
        run_available_now(wide, out, ck)
    # sentinels cannot reach the output (hop 1 is inner and no
    # sentinel key matches across inputs); the guard only documents it
    return read_back(spark, out).filter(F.col("order_id") >= 0).select(
        "id", "order_id", "sku_id", "sku_num", "split_total_amount",
        "user_id", "create_time", "activity_id", "coupon_id",
    )
