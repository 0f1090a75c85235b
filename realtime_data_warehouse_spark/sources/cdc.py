"""CDC change-row model (SURVEY §2.1 S2).

Spark has no native MySQL-CDC source; the idiomatic model is a
DataFrame of change rows carrying the Maxwell-style envelope the
reference consumes from `topic_db` (type: insert/update/delete/
bootstrap-*, data, old — FIXTURES.md §1.1, DimApp.java:126-151).
Downstream operators apply them with MERGE-style upsert semantics
(sinks.upsert). This module synthesizes deterministic change streams
from the driver's batch tables so the upsert / retraction paths
(SURVEY J1, A6, K5) are exercised without a database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_change_rows(snapshot: DataFrame, table: str, key_col: str,
                   ts_col: str, database: str = "gmall") -> DataFrame:
    """Wrap a batch snapshot as bootstrap-insert change rows: every
    column stringified into the `data` map — the shape
    DimApp.java:184-188 accepts during the initial snapshot phase."""
    cols = snapshot.columns
    kv = []
    for c in cols:
        kv.extend([F.lit(c), F.col(c).cast("string")])
    return snapshot.select(
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.lit("bootstrap-insert").alias("type"),
        F.unix_timestamp(F.col(ts_col)).alias("ts"),
        F.create_map(*kv).alias("data"),
        F.lit(None).cast("map<string,string>").alias("old"),
    )


def synthesize_updates(snapshot: DataFrame, table: str, key_col: str,
                       ts_col: str, update_col: str,
                       fraction_bps: int = 500,
                       database: str = "gmall") -> DataFrame:
    """Deterministically re-emit a fraction of rows as `update` change
    rows with a changed `update_col` and an `old` map — the pattern
    FIXTURES.md §4 describes for exercising upsert/retraction. The
    selection is `key % 10000 < bps` — no randomness and trivially
    re-expressible in the oracle SQL, so golden tests stay stable."""
    picked = snapshot.filter(
        F.pmod(F.col(key_col).cast("long"), F.lit(10_000)) < F.lit(fraction_bps)
    )
    cols = snapshot.columns
    kv = []
    for c in cols:
        new_val = (
            (F.col(c) * 2).cast("string") if c == update_col else F.col(c).cast("string")
        )
        kv.extend([F.lit(c), new_val])
    return picked.select(
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.lit("update").alias("type"),
        (F.unix_timestamp(F.col(ts_col)) + F.lit(1)).alias("ts"),
        F.create_map(*kv).alias("data"),
        F.create_map(F.lit(update_col), F.col(update_col).cast("string")).alias("old"),
    )


def changelog(snapshot: DataFrame, table: str, key_col: str, ts_col: str,
              update_col: str, database: str = "gmall") -> DataFrame:
    """bootstrap snapshot + deterministic updates, union'd — a full
    StartupOptions.initial()-style changelog (FlinkSourceUtil.java:46-62)."""
    return to_change_rows(snapshot, table, key_col, ts_col, database).unionByName(
        synthesize_updates(snapshot, table, key_col, ts_col, update_col,
                           database=database)
    )
