"""Windowed aggregation operators (SURVEY §2.5 A1–A5).

Every DWS app in the reference is a keyed (or global) tumbling
event-time window with an incremental reduce plus a
ProcessWindowFunction that stamps window bounds
(DwsTradeSkuOrderWindow.java:124-156). In Spark this is one
declarative `groupBy(window(ts, d), *keys).agg(...)`:

- the incremental reduce = Spark partial aggregation (map-side
  combine), automatic — no custom pre-agg operator;
- the window-bound stamping = `window.start` / `window.end`
  projected as `stt`/`edt` strings;
- `cur_date` derives from window start (event time), not wall clock,
  so results are deterministic (SURVEY §7.4.6: the reference mixes
  System.currentTimeMillis and window start; we standardize on the
  latter, as DwsTradeOrderWindow.java:102 does).

At scale: the only shuffle is the hash exchange on
(window, *keys) — identical key-space to the reference's keyBy;
AQE coalesces post-shuffle partitions. Global windows (A4) still
parallelize the partial aggregation and only merge one group's
finals, same as Flink's windowAll pre-aggregated by `reduce`.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import fmt_date, fmt_datetime


def stamp_window_bounds(df: DataFrame, window_col: str = "window") -> DataFrame:
    """Project window struct → stt/edt datetime strings + cur_date
    (TradeSkuOrderBean stt/edt/cur_date fields,
    DwsTradeSkuOrderWindow.java:142-147)."""
    return (
        df.withColumn("stt", fmt_datetime(F.col(f"{window_col}.start")))
        .withColumn("edt", fmt_datetime(F.col(f"{window_col}.end")))
        .withColumn("cur_date", fmt_date(F.col(f"{window_col}.start")))
        .drop(window_col)
    )


def tumble(df: DataFrame, ts_col: str, duration: str,
           keys: list[str] | None = None,
           aggs: Mapping[str, Column] | None = None,
           stamp: bool = True) -> DataFrame:
    """A1/A2/A4/A5 — tumbling event-time window aggregate.

    keys=[] gives the reference's windowAll
    (DwsTradeOrderWindow.java:82); keys=[...] the keyed variant
    (DwsTradeSkuOrderWindow.java:125-130). `aggs` maps output alias →
    aggregate Column, so callers control exact output names (the
    oracle contract requires stable aliases).
    """
    keys = keys or []
    aggs = dict(aggs or {"row_count": F.count(F.lit(1))})
    grouped = df.groupBy(F.window(F.col(ts_col), duration), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return stamp_window_bounds(out) if stamp else out


def distinct_set_agg(df: DataFrame, keys: list[str], set_col: str,
                     sum_cols: Mapping[str, Column],
                     count_alias: str = "order_count",
                     exact: bool = True) -> DataFrame:
    """A3 — per-key sum + distinct-id count
    (DwsTradeProvinceOrderWindow.java:117-145 keeps a Set<String> of
    order ids and emits set.size). Exact mode = count_distinct —
    unlike the reference's in-memory Set this is a shuffle-based
    exact distinct that scales; at 100 TB switch exact=False for
    approx_count_distinct (HLL, no second shuffle)."""
    counter = (
        F.count_distinct(F.col(set_col)) if exact
        else F.approx_count_distinct(F.col(set_col))
    )
    aggs = [c.alias(name) for name, c in sum_cols.items()]
    return df.groupBy(*keys).agg(counter.alias(count_alias), *aggs)


def session_agg(df: DataFrame, ts_col: str, gap: str, keys: list[str],
                aggs: Mapping[str, Column]) -> DataFrame:
    """Session-window aggregation — events of one key belong to the
    same session while consecutive gaps stay under `gap`.

    The reference has no session windows at all (SURVEY §2.9 T6);
    Spark ships them natively (F.session_window), in batch and
    Structured Streaming alike. The batch plan is one hash exchange
    on the keys + a sort to merge overlapping raw windows — the same
    cost envelope as the gaps-and-islands SQL a user would hand-write,
    with the streaming twin for free (windows/streaming_tumble's
    session variant would use the identical expression).

    Output: keys + session_start / session_end (formatted strings,
    hash-stable under the pinned session timezone) + the aggregates.
    """
    win = F.session_window(F.col(ts_col), gap)
    grouped = df.groupBy(win, *keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return grouped.select(
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        *keys,
        *aggs.keys(),
    )


def time_bucket_rollup(df: DataFrame, ts_col: str,
                       sum_cols: Mapping[str, Column],
                       grains: Sequence[tuple[str, str]] = (
                           ("hour", "hour"), ("day", "day"), ("month", "month"),
                       )) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: per-grain
    time_bucket aggregates where every coarser grain re-aggregates the
    NEXT-FINER grain's partials instead of rescanning the base table —
    a month bucket sums ~30 day-rows, not millions of raw rows.

    `sum_cols` must be re-aggregatable by summation (counts and sums;
    for distinct counts store HLL sketches and hll_union at the coarser
    grain — same plan shape). Output is the union of all grains with a
    `grain` discriminator and the bucket start stamped hash-stably.

    Scale: the base scan happens ONCE (the finest grain); each further
    level shuffles only the previous level's bucket rows — at 100 TB
    the hour level is the only big exchange, day/month are a few
    thousand rows. This mirrors how a hypertable refreshes materialized
    rollups, expressed as three Catalyst aggregates chained on partials.
    """
    finest_name, finest_unit = grains[0]
    level = df.groupBy(
        F.date_trunc(finest_unit, F.col(ts_col)).alias("bucket")
    ).agg(*[c.alias(n) for n, c in sum_cols.items()])
    names = list(sum_cols.keys())

    def stamped(lvl: DataFrame, grain: str) -> DataFrame:
        return lvl.select(
            F.lit(grain).alias("grain"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            *names,
        )

    out = stamped(level, finest_name)
    for grain_name, unit in grains[1:]:
        level = level.groupBy(
            F.date_trunc(unit, F.col("bucket")).alias("bucket")
        ).agg(*[F.sum(n).alias(n) for n in names])
        out = out.unionByName(stamped(level, grain_name))
    return out
