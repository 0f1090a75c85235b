"""Round 10 — EXACT as-of under bounded per-key lateness.

The as-of stream now carries three certified arrival contracts:

1. strict per-key event-time order (`stream_asof_enrich`, round 8) —
   O(1) latest-right state, exact;
2. arbitrary cross-key disorder, per-key order kept
   (`stream_asof_disordered`, round 9) — same kernel, exact, because
   state is keyed;
3. bounded per-key LATENESS (this entry) — rows arrive up to `slack`
   event-time out of order WITHIN a key. The O(1) kernel can only
   degrade safely there (a late left emits unmatched — pinned by
   tests); `stateful.asof_enrich_stream_exact` instead buffers a
   bounded right HISTORY plus the undecided lefts and emits each
   left only when the key's frontier (max event time seen − slack)
   passes it, so every emission is the true backward-inclusive
   match. Reference anchor: T1 bounded out-of-orderness
   (DwsTradeSkuOrderWindow.java:213-221) is precisely this slack —
   the reference buffers in its watermark machinery, we buffer in
   keyed state.

The staging (`runner.staged_files_dir_bounded_late`) makes the
lateness REAL: arrival position = event time + deterministic jitter
in [0, slack), range-split into micro-batches — so batches genuinely
interleave views and purchases up to an hour out of event-time order.
Hash-matching the same DuckDB native `ASOF LEFT JOIN` oracle as the
other two entries proves the buffered kernel reproduces the batch
join exactly on this third arrival path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register
from .round8 import _ASOF_STREAM_ORACLE

#: one hour of bounded per-key lateness, in microseconds (the tagged
#: stream's clock) — large enough that thousands of events genuinely
#: reorder at sf0.01+, small enough that per-key buffered state stays
#: a slack window, not history.
_SLACK_US = 3_600_000_000


def _tagged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same tagged view/purchase stream as stream_asof_enrich
    (plans/round8.py): views deduped per (user, ts) to max event_id —
    the tie discipline both engines share."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("rid"),
             F.expr("max_by(value, event_id)").alias("value"))
        .select("user_id", F.unix_micros("ts").alias("ts_us"),
                F.lit(0).alias("tag"), F.col("rid").alias("id"),
                "rid", "value")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("ts_us"),
                F.lit(1).alias("tag"), F.col("event_id").alias("id"),
                F.lit(None).cast("long").alias("rid"),
                F.lit(None).cast("double").alias("value"))
    )
    return views.unionByName(purchases)


@register("stream_asof_late", tier="variant",
          oracle=_ASOF_STREAM_ORACLE)
def stream_asof_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment, EXACT under bounded per-key lateness (module
    docstring): the tagged stream replays through the bounded-late
    staging (arrival = event time + hash-jitter < 1 h), the
    watermark-buffered kernel holds undecided rows until the per-key
    frontier passes them, and an end-of-stream punctuation batch
    (stateful.ASOF_FLUSH_TAG) flushes the final slack window. Output
    hash must equal the SAME DuckDB ASOF oracle as the ordered and
    disordered twins — the proof the buffering is exact, not merely
    convergent."""
    from ..streaming.runner import (
        append_final_file,
        read_back,
        run_available_now,
        staged_files_dir_bounded_late,
    )
    from ..streaming.stateful import ASOF_FLUSH_TAG, asof_enrich_stream_exact
    from .streaming_queries import _auto_store, _dirs, _stage_once

    tagged = _tagged_events(spark, sf_dir)

    def build(base: str) -> str:
        in_dir = staged_files_dir_bounded_late(
            tagged, base, ts_col="ts_us", jitter_cols=("id", "tag"),
            slack=_SLACK_US, n_files=4)
        flush = (
            tagged.select("user_id").distinct()
            .select("user_id",
                    F.lit(1 << 62).alias("ts_us"),
                    F.lit(ASOF_FLUSH_TAG).alias("tag"),
                    F.lit(0).cast("long").alias("id"),
                    F.lit(None).cast("long").alias("rid"),
                    F.lit(None).cast("double").alias("value"),
                    F.lit(1 << 62).alias("__arr"))
        )
        append_final_file(in_dir, flush)
        return in_dir

    in_dir = _stage_once(sf_dir, "asof_tagged_late", build)
    _, out, ck = _dirs()
    sdf = (
        spark.readStream
        .schema("user_id long, ts_us long, tag int, id long, "
                "rid long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    enriched = asof_enrich_stream_exact(
        sdf, key_col="user_id", ts_col="ts_us", tag_col="tag",
        id_col="id", payload_cols=("rid", "value"), slack=_SLACK_US)
    with _auto_store(spark, sf_dir, "asof_tagged_late", in_dir, "user_id"):
        run_available_now(enriched, out, ck)
    return read_back(spark, out).select(
        F.col("id").alias("purchase_id"),
        "user_id",
        F.col("rid").alias("view_event_id"),
        (F.col("ts_us") - F.col("matched_ts")).alias("gap_us"),
        F.col("value").alias("view_value"),
    )
