"""Streaming windowed aggregations (SURVEY T1–T6, A1–A5 twins).

Same declarative tumble as operators/agg.py, but over an unbounded
source with a watermark: `withWatermark(ts, delay)` bounds window
state exactly like the reference's bounded-out-of-orderness watermark
(3–5 s: DwsTradeSkuOrderWindow.java:213-221) — we default to "5
seconds" to mirror it; callers widen it for replays of historical
files where event time spans months.

Append output mode = emit a window only once it is final (watermark
passed window end), the same contract as Flink's default fire-once
event-time trigger. Late rows beyond the watermark are dropped — T6:
the reference sets no allowedLateness either.

Scale: state per in-flight window key lives in the executor state
store; watermark GC bounds it to (delay / window-length + 1) windows
per key — identical asymptotics to Flink's window state. The shuffle
on (window, keys) is the only exchange, and partial aggregation
happens map-side before it, so a 1000-executor run shuffles
pre-aggregated partials, not raw events.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.agg import stamp_window_bounds
from ..sources.streams import file_stream

#: Current driver layout: events.parquet stores no-timezone
#: timestamp[us]; requesting TimestampType in the read schema yields
#: session-tz (UTC-pinned) instants directly — the stream twin of
#: sources/batch.load_table's ntz→ltz normalization. The driver has
#: ALSO shipped this table as INT64 TIMESTAMP(NANOS) in earlier
#: rounds; events_ts_schema below adapts per actual file layout.
EVENTS_RAW = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def events_ts_schema(spark: SparkSession, path: str) -> tuple[T.StructType, bool]:
    """Peek the actual parquet layout of an events table and return
    (read schema, ts_is_raw_nanos). With nanosAsLong=true an INT64
    TIMESTAMP(NANOS) column infers as LongType; the timestamp[us]
    layout infers as (n)tz timestamp. Centralizing the sniff here
    keeps every streaming reader layout-proof the same way batch
    load_table is — if the driver flips layouts again, nothing else
    changes."""
    inferred = spark.read.parquet(path).schema
    nanos = isinstance(inferred["ts"].dataType, T.LongType)
    fields = [
        T.StructField("ts", T.LongType() if nanos else T.TimestampType())
        if f.name == "ts" else f
        for f in EVENTS_RAW.fields
    ]
    return T.StructType(fields), nanos


def stream_events(spark: SparkSession, path_or_sf_dir: str,
                  watermark: str = "1 hour",
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """events table as a watermarked stream (S1+S3 analogue).

    Accepts either an sf dir (appends events.parquet) or a staged
    stream-input dir of parquet files; adapts to either historical
    ts layout (events_ts_schema)."""
    path = path_or_sf_dir
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "events.parquet")):
        path = os.path.join(path, "events.parquet")
    schema, nanos = events_ts_schema(spark, path)
    raw = file_stream(spark, path, schema)
    if max_files_per_trigger is not None:
        raw = (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(path)
        )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withWatermark("ts", watermark)


def streaming_tumble(sdf: DataFrame, ts_col: str, duration: str,
                     keys: list[str] | None = None,
                     aggs: dict[str, F.Column] | None = None,
                     stamp: bool = True) -> DataFrame:
    """A1/A2/A4/A5 twin: tumbling event-time window over a watermarked
    stream. Identical group/agg expression tree to operators/agg.tumble
    — the parity test's whole premise is that only the source/trigger
    differ, never the plan."""
    keys = keys or []
    aggs = dict(aggs or {"row_count": F.count(F.lit(1))})
    grouped = sdf.groupBy(F.window(F.col(ts_col), duration), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return stamp_window_bounds(out) if stamp else out


def streaming_page_view_window(spark: SparkSession, source_path: str,
                               watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of plans.registry.dws_traffic_page_view_window
    (keyed hourly tumble with pv / uv / value_sum).

    `uv` uses approx_count_distinct: exact count_distinct is
    unsupported inside streaming aggregations (it would need all
    member ids in window state); HLL sketch state is O(k) per window —
    the same trade the reference's Set-based A3 cannot make.
    """
    events = stream_events(spark, source_path, watermark)
    return streaming_tumble(
        events, "ts", "1 hour", keys=["event_type"],
        aggs={
            "pv": F.count(F.lit(1)),
            "uv": F.approx_count_distinct("user_id"),
            "value_sum": F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
        },
    ).select("stt", "edt", "cur_date", "event_type", "pv", "uv", "value_sum")


def streaming_session(sdf: DataFrame, ts_col: str, gap: str,
                      keys: list[str] | None = None,
                      aggs: dict[str, F.Column] | None = None) -> DataFrame:
    """Session-window twin of operators/agg.session_agg: same
    F.session_window expression over a watermarked stream. A session
    closes (and emits, in append mode) once the watermark passes its
    end = last-event + gap; state per open session is one partial
    aggregate, GC'd at close — unbounded keys stay bounded by watermark.
    """
    keys = keys or []
    aggs = dict(aggs or {"events": F.count(F.lit(1))})
    grouped = sdf.groupBy(F.session_window(F.col(ts_col), gap), *keys)
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        *keys,
        *aggs.keys(),
    )
