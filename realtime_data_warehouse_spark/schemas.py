"""Canonical StructTypes for the engine.

The reference is schemaless on its DataStream path (fastjson maps,
DwdBaseLog.java:86-129) and declares per-app DDL on its SQL path
(SQLUtil.java:17-29). We declare every envelope once; truly dynamic
CDC payloads stay MapType(String,String) exactly like the reference's
`data`/`old` maps.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ODS envelopes
# ---------------------------------------------------------------------------

#: Maxwell-style CDC envelope of `topic_db` (reference SQLUtil.java:17-29,
#: FIXTURES.md §1.1). `data` is the post-image, `old` the changed columns'
#: prior values (update only).
TOPIC_DB = T.StructType([
    T.StructField("database", T.StringType()),
    T.StructField("table", T.StringType()),
    T.StructField("type", T.StringType()),      # insert|update|delete|bootstrap-*
    T.StructField("ts", T.LongType()),          # epoch seconds
    T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    T.StructField("old", T.MapType(T.StringType(), T.StringType())),
])

#: Debezium-style CDC envelope of the MySQL config tables
#: (FlinkSourceUtil.java:46-62, DimApp.java:129-146).
CDC_CONFIG = T.StructType([
    T.StructField("op", T.StringType()),        # c|r|u|d
    T.StructField("before", T.MapType(T.StringType(), T.StringType())),
    T.StructField("after", T.MapType(T.StringType(), T.StringType())),
])

#: Behavior log `topic_log` (DwdBaseLog.java:225-246, FIXTURES.md §1.2).
_COMMON = T.StructType([
    T.StructField("mid", T.StringType()),
    T.StructField("uid", T.StringType()),
    T.StructField("vc", T.StringType()),
    T.StructField("ch", T.StringType()),
    T.StructField("ar", T.StringType()),
    T.StructField("is_new", T.StringType()),
    T.StructField("sid", T.StringType()),
])
_PAGE = T.StructType([
    T.StructField("page_id", T.StringType()),
    T.StructField("last_page_id", T.StringType()),
    T.StructField("item", T.StringType()),
    T.StructField("item_type", T.StringType()),
    T.StructField("during_time", T.LongType()),
])
TOPIC_LOG = T.StructType([
    T.StructField("common", _COMMON),
    T.StructField("page", _PAGE),
    T.StructField("start", T.MapType(T.StringType(), T.StringType())),
    T.StructField("err", T.MapType(T.StringType(), T.StringType())),
    T.StructField("displays", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    T.StructField("actions", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    T.StructField("ts", T.LongType()),          # epoch millis
])

#: Routing config rows (TableProcessDim.java:10-28 / TableProcessDwd.java:10-24).
TABLE_PROCESS_DIM = T.StructType([
    T.StructField("source_table", T.StringType()),
    T.StructField("sink_table", T.StringType()),
    T.StructField("sink_columns", T.StringType()),   # CSV
    T.StructField("sink_family", T.StringType()),
    T.StructField("sink_row_key", T.StringType()),
    T.StructField("op", T.StringType()),
])
TABLE_PROCESS_DWD = T.StructType([
    T.StructField("source_table", T.StringType()),
    T.StructField("source_type", T.StringType()),
    T.StructField("sink_table", T.StringType()),
    T.StructField("sink_columns", T.StringType()),
    T.StructField("op", T.StringType()),
])

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — names only; parquet carries the schema.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: events.parquet layout (driver-generated), for file-stream sources where
#: readStream requires an explicit schema.
EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),      # JSON payload {"k": int}
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])
