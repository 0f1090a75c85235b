"""Stream-stream joins (SURVEY §2.4 J1/J2, §2.9 T9).

The reference's DWD joins are Flink SQL stream-stream joins with
idle-state TTL (5 s / 15 s: DwdTradeOrderDetail.java:20) and one
explicit interval join (payment BETWEEN order_time − 15 min AND
order_time + 5 s: DwdTradeOrderPaySucDetail.java:123-148). Spark's
native equivalent: both sides watermarked + an event-time range
predicate in the join condition — the range bound IS the state TTL
(state for a row is dropped once the other side's watermark passes
its window), so Flink's TTL knob maps to the interval width, not to a
separate setting.

Scale: stream-stream joins shuffle both sides by the equi key; state
per key is bounded by (watermark delay + interval width) × rate.
Inner joins emit eagerly; left-outer emits the null row only when the
watermark proves no match can arrive — same semantics gap vs Flink
(which emits+retracts) documented in SURVEY §7.4.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame,
                  equi: Column, left_ts: str, right_ts: str,
                  lower: str, upper: str,
                  how: str = "inner") -> DataFrame:
    """J2 — interval join: rows match when
    right_ts BETWEEN left_ts − lower AND left_ts + upper (and the equi
    key matches). Both inputs must already carry withWatermark.

    `lower`/`upper` are interval literals ("15 minutes", "5 seconds").
    """
    cond = (
        equi
        & (F.col(right_ts) >= F.expr(f"{left_ts} - interval {lower}"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + interval {upper}"))
    )
    return left.join(right, cond, how)


def windowed_equi_join(left: DataFrame, right: DataFrame,
                       equi: Column, left_ts: str, right_ts: str,
                       ttl: str, how: str = "inner") -> DataFrame:
    """J1 — plain equi join with TTL-bounded state: the reference's
    idle-state-retention joins become a symmetric ±ttl range bound
    (a row only matches rows within ttl of it — exactly what Flink's
    idle-state TTL enforced by eviction)."""
    return interval_join(left, right, equi, left_ts, right_ts, ttl, ttl, how)
