"""Round 9 — disorder-parity certification for the keyed-state path.

Every staged replay in this repo delivers GLOBAL event-time order
(range-split on the time column) — stronger than what a 100 TB Kafka
replay guarantees. A keyed topic gives per-partition (hence per-key)
order and NOTHING across keys; the reference leans on exactly that
contract plus bounded out-of-orderness (T1,
DwsTradeSkuOrderWindow.java:213-221). Round 9 adds the keyed staging
(`runner.staged_files_dir_keyed`: per-key order kept, cross-key
alignment scrambled — batch k holds every key's k-th rank range,
whatever the absolute timestamps) and certifies the keyed-state
operators on it.

This entry replays the as-of enrichment through the DISORDERED
staging against the same DuckDB native `ASOF LEFT JOIN` oracle as
`stream_asof_enrich` (plans/round8.py): a hash-match here proves the
operator's answer is invariant to cross-key arrival order against a
third engine, not merely self-consistent. (Per-key LATENESS — the
slack on top — degrades safely rather than exactly; that contract is
pinned by tests, not an oracle:
test_asof_enrich_stream_bounded_lateness_degrades_safely.)
Tier "variant": it is the second physical arrival path of the
round-8 entry, kept as two-path correctness evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register
from .round8 import _ASOF_STREAM_ORACLE


@register("stream_asof_disordered", tier="variant",
          oracle=_ASOF_STREAM_ORACLE)
def stream_asof_disordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`stream_asof_enrich`'s twin on the keyed (cross-key-disordered)
    replay: same tagged view/purchase stream, same keyed-state kernel
    (`streaming/stateful.asof_enrich_stream`), same DuckDB ASOF
    oracle — but micro-batch k now carries each USER's k-th slice of
    events instead of the global k-th time range, so batches mix
    early and late absolute timestamps across users. State is keyed,
    so the answer must not move; the oracle hash is the proof."""
    from ..streaming.runner import (
        read_back,
        run_available_now,
        staged_files_dir_keyed,
    )
    from ..streaming.stateful import asof_enrich_stream
    from .streaming_queries import _dirs, _stage_once

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
    tagged = views.unionByName(purchases)
    in_dir = _stage_once(
        sf_dir, "asof_tagged_keyed",
        lambda base: staged_files_dir_keyed(
            tagged, base, key_col="user_id",
            order_col=("ts_us", "tag", "id"), n_files=3),
    )
    _, out, ck = _dirs()
    sdf = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    enriched = asof_enrich_stream(
        sdf, key_col="user_id", ts_col="ts_us", tag_col="tag",
        id_col="id", payload_cols=("rid", "value"))
    from .streaming_queries import _auto_store  # noqa: PLC0415

    with _auto_store(spark, sf_dir, "asof_tagged_keyed", in_dir, "user_id"):
        run_available_now(enriched, out, ck)
    return read_back(spark, out).select(
        F.col("id").alias("purchase_id"),
        "user_id",
        F.col("rid").alias("view_event_id"),
        (F.col("ts_us") - F.col("matched_ts")).alias("gap_us"),
        F.col("value").alias("view_value"),
    )
