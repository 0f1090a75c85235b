"""Stateful semantics, batch-exact form (SURVEY §2.5 A6–A8).

These are the three places the reference needs keyed state
(ValueState/MapState + TTL). Their *semantics* are set-level
statements — "aggregate the latest row per id", "first event per
user per day", "a user's first-ever date" — so in batch they are
window functions / dedups, exact and oracle-checkable. The streaming
twins (applyInPandasWithState) live in streaming/stateful.py; these
batch forms are also what the golden tests compare them against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: Sequence[str], order_col: str,
                   tiebreak: Sequence[str] = ()) -> DataFrame:
    """A6 — upsert-consumer view: keep the newest row per key.

    The reference's "度量值修正" MapState trick
    (DwsTradeSkuOrderWindow.java:158-201) emits deltas so sums
    converge to the latest value per order_detail.id; the set-level
    semantic is exactly `row_number() over (partition by id order by
    ts desc) = 1`. One shuffle on the key — same exchange the
    downstream keyed aggregation needs anyway, so at scale the
    partitioning is reused."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def daily_first_event(df: DataFrame, user_col: str, ts_col: str,
                      date_col: str = "dt") -> DataFrame:
    """A7 — daily-UV dedup: keep each user's first event per day
    (ValueState last-seen-date pattern,
    DwsTrafficVcChArIsNewPageViewWindow.java:120-178). Batch form:
    dedup on (user, date) keeping the earliest ts."""
    with_dt = df.withColumn(date_col, F.to_date(F.col(ts_col)))
    return latest_per_key_min(with_dt, [user_col, date_col], ts_col)


def latest_per_key_min(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Earliest-row-per-key variant (row_number over ascending order)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_visit_repair(df: DataFrame, user_col: str, ts_col: str,
                       is_new_col: str = "is_new") -> DataFrame:
    """A8 — `is_new` fix (DwdBaseLog.java:143-186): a record may claim
    is_new=1, but if the user's first-ever visit was an earlier day it
    is downgraded to 0. Batch form: min(date) over user, compare.

    Adds `first_dt` and `is_new_fixed` columns.

    Intentional divergence from the streaming twin
    (streaming/stateful.is_new_repair_stream): the reference anchors
    first_dt to the PRIOR day when the first record it observes claims
    is_new=0 (an old user whose state predates the stream). A batch
    repair sees the full history, where "before the data started" has
    no meaning — first_dt here is always the user's true min(date), so
    a same-day is_new=1 after an is_new=0 keeps its claim."""
    w = Window.partitionBy(user_col)
    with_dt = df.withColumn("__dt", F.to_date(F.col(ts_col)))
    out = with_dt.withColumn("first_dt", F.min("__dt").over(w))
    fixed = F.when(F.col("__dt") > F.col("first_dt"), F.lit(0)).otherwise(
        F.coalesce(F.col(is_new_col).cast("int"), F.lit(1))
    )
    return out.withColumn("is_new_fixed", fixed).drop("__dt")


def new_vs_returning(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """A7 variant used by order/payment windows
    (DwsTradeOrderWindow.java:48-81): per user per day one row, with
    `is_first_ever` = this day is the user's first-ever activity day.
    Feeds unique_user_count vs new_user_count aggregates."""
    daily = daily_first_event(df, user_col, ts_col)
    w = Window.partitionBy(user_col)
    return daily.withColumn(
        "is_first_ever",
        (F.col("dt") == F.min("dt").over(w)).cast("int"),
    )
