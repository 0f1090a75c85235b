"""Batch sources: parquet warehouse tables and JDBC lookups.

Reference analogues: the HBase dim tables (HBaseUtil.java:80-103),
the JDBC config bootstrap (JdbcUtil.java:30-67) and the `base_dic`
lookup table (Test03.java:37-49). In this engine every warehouse
table is a parquet (or Delta, when available) directory that Spark
scans with pushdown + pruning, so "lookup" is just a broadcastable
DataFrame — no KV store or cache tier needed (SURVEY §1.1: Redis
cache row replaced by broadcast).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: columns stored as INT64 TIMESTAMP(NANOS) in the driver parquet —
#: Spark reads them as raw nanos (legacy.parquet.nanosAsLong=true in
#: session.py) and we truncate to micros, same as DuckDB's ns→µs read.
_NANO_TS_COLS = {"events": ("ts",)}


#: analyzed-DataFrame cache, the Python face of what a metastore
#: catalog provides: `spark.read.parquet` pays a JVM file listing +
#: footer schema inference (~0.1-0.2 s) on EVERY call, and registry
#: queries re-load the same immutable tables constantly — at 100 TB
#: that metadata round trip is exactly what `spark.table()` against
#: a catalog amortizes. Keyed weakly per session so a stopped
#: session's entries are collectable; DataFrames are immutable, so
#: sharing the analyzed plan across queries is safe.
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one warehouse table. Column pruning + predicate pushdown
    reach the parquet scan because callers filter/select on the
    returned DataFrame before any action.

    Timestamp normalization: the driver's parquet has shipped `ts`
    both as INT64 TIMESTAMP(NANOS) and as no-timezone timestamp[us]
    (which Spark reads as TIMESTAMP_NTZ). Either way callers get a
    session-tz TIMESTAMP — the session is pinned UTC, so the ntz→ltz
    cast is value-identical and every epoch/unix_* function works."""
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    per_session[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        df = df.select(*[
            F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c)
            for c in df.columns
        ])
    return df


#: fan_out result cache (r12, guide §1.2 step 2 — per-call work):
#: `df.rdd.getNumPartitions()` converts the plan to an RDD in the JVM
#: (analysis + physical planning + py4j round trips) on EVERY call,
#: and registry queries call fan_out on the same session-cached
#: load_table DataFrames constantly — a pure plan-build tax of
#: ~0.1 s/call that a bench of 60+ queries × 3 passes pays hundreds
#: of times. The decision (and the derived DataFrame, immutable like
#: load_table's) is memoized per (source DataFrame, target). Weak
#: keys: entries die with their session's table cache.
_FAN_OUT_CACHE: "weakref.WeakKeyDictionary[DataFrame, dict]" = (
    weakref.WeakKeyDictionary()
)


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin re-split of an under-partitioned scan before
    CPU-heavy map work (tokenize/shingle/hash/Arrow-UDF stages).

    Parquet only splits at row-group boundaries, so a source written
    as few large row groups (or one file per table, as the local
    testdata is) scans as ≤ row-group-count partitions and serializes
    every downstream map stage onto that many cores, no matter how
    wide the cluster is. When the scan already yields ≥ the target
    partitions — the normal case on a real multi-file 100 TB table —
    this is a no-op with zero added shuffle; otherwise the tiny
    re-split exchange buys a cluster-wide map stage.

    Deliberately NOT inside load_table: plain scans that feed a
    shuffle (groupBy/join) get redistributed by that exchange anyway,
    and an unconditional repartition would just add a wasted shuffle
    of the full input."""
    target = parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        per_df = _FAN_OUT_CACHE.setdefault(df, {})
    except TypeError:  # un-weakref-able subclass: fall through uncached
        per_df = {}
    got = per_df.get(target)
    if got is not None:
        return got
    out = df if df.rdd.getNumPartitions() >= target else df.repartition(target)
    per_df[target] = out
    return out


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view for the SQL entry points."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def jdbc_lookup(spark: SparkSession, url: str, table: str,
                properties: dict[str, str] | None = None) -> DataFrame:
    """JDBC batch read (S5/S6: JdbcUtil.java:30-67, Test03.java:37-49).

    The reference preloads config into a driver HashMap; in Spark the
    same rows stay a DataFrame and get broadcast into the join —
    no driver-side map needed.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16,
                   sort_col: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by its join
    key. Two tables bucketed the same way equi-join WITHOUT any
    exchange — each task zips bucket i with bucket i — which at 100 TB
    turns the recurring fact⋈fact shuffle into a map-side join. The
    shuffle is paid ONCE at write time instead of per query; this is
    the batch analogue of the reference keeping HBase dim tables
    pre-keyed by rowkey (HBaseUtil.java:80-103).

    Uses the session catalog (saveAsTable — bucketing metadata lives
    in the metastore; a plain .parquet(path) write cannot record it).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if sort_col is not None:
        writer = writer.bucketBy(n_buckets, bucket_col).sortBy(sort_col)
    else:
        writer = writer.bucketBy(n_buckets, bucket_col)
    writer.saveAsTable(table)
