"""DIM layer — config-driven dimension routing + maintenance
(SURVEY §3.3: DimApp.handle, J4 broadcast-config join, P6 dynamic
projection, K6 upsert/delete sink).

The reference connects the business CDC stream with a broadcast
config-table changelog, prunes each record's `data` map to the
config's `sink_columns` CSV, and Puts/Deletes the row into a per-dim
HBase table (DimApp.java:37-100, DimHBaseSinkFunction.java:16-105).

Spark-first shape:
- the config table is a tiny DataFrame broadcast into an equi-join on
  `table` — one broadcast exchange, zero shuffles on the fact side
  (the reference's broadcast state, DimApp.java:52-58);
- `sink_columns` pruning is `map_filter` over the CDC map — executed
  JVM-side, no UDF (DimApp.java:75-88's JSON key removal);
- maintenance is streaming/sinks.dim_upsert_batch: latest-per-rowkey
  MERGE + delete application per micro-batch (Delta MERGE INTO in
  production — see sinks.py scale note).

At 100 TB the routed stream shuffles only for the final per-table
latest-per-key dedup, partitioned by rowkey — the same exchange a
MERGE needs anyway; everything upstream (join, prune) is map-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TABLE_PROCESS_DIM
from ..sources.batch import load_table
from ..sources.cdc import changelog
from .registry import register

#: table_process_dim rows (TableProcessDim.java:10-28): which source
#: tables are dimensions, where they land, and which columns survive.
DIM_CONFIG = [
    ("part", "dim_sku_info", "p_brand,p_name,p_partkey,p_size", "info", "p_partkey", "r"),
    ("supplier", "dim_supplier", "s_name,s_nationkey,s_suppkey", "info", "s_suppkey", "r"),
    ("nation", "dim_base_province", "n_name,n_nationkey,n_regionkey", "info", "n_nationkey", "r"),
]

#: (key_col, update_col) per dim source for the synthetic changelog.
_DIM_KEYS = {
    "part": ("p_partkey", "p_size"),
    "supplier": ("s_suppkey", "s_nationkey"),
    "nation": ("n_nationkey", "n_regionkey"),
}


def dim_config_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DIM_CONFIG, TABLE_PROCESS_DIM)


def dim_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of per-dim synthetic CDC changelogs (bootstrap + update +
    delete) — the `topic_db` feed restricted to dim tables."""
    parts = []
    for table, (key_col, update_col) in _DIM_KEYS.items():
        snap = load_table(spark, sf_dir, table)
        parts.append(changelog(snap, table, key_col, None, update_col,
                               with_deletes=True))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def route_dim_changes(changes: DataFrame, config: DataFrame) -> DataFrame:
    """J4 + P6: broadcast-config join, sink_columns map pruning,
    rowkey extraction. Returns (sink_table, rowkey, type, ts, data)
    where data holds only configured columns."""
    cfg = F.broadcast(config)
    joined = changes.join(cfg, changes["table"] == cfg["source_table"], "inner")
    cols = F.split(F.col("sink_columns"), ",")
    pruned = F.map_filter("data", lambda k, v: F.array_contains(cols, k))
    return joined.select(
        "sink_table",
        F.element_at("data", F.col("sink_row_key")).alias("rowkey"),
        "type",
        "ts",
        pruned.alias("data"),
    )


def _kv_string(data_col: str = "data") -> F.Column:
    """Canonical 'k=v,...' string in sorted key order — a hash-stable
    serialization of the pruned map for the oracle comparison (map
    iteration order is engine-specific; sorted join is not)."""
    d = F.col(data_col)
    return F.array_join(
        F.transform(
            F.array_sort(F.map_keys(d)),
            lambda k: F.concat(k, F.lit("="), F.element_at(d, k)),
        ),
        ",",
    )


def _dim_oracle_sql() -> str:
    """DuckDB twin of dim_config_routing: replays the deterministic
    changelog synthesis + config pruning as plain SQL per dim table."""
    selects = []
    for table, sink_table, sink_columns, _fam, row_key, _op in DIM_CONFIG:
        key_col, update_col = _DIM_KEYS[table]
        cols = sorted(sink_columns.split(","))

        def kv(double_col: str | None = None) -> str:
            pieces = []
            for c in cols:
                val = f"CAST({c}*2 AS VARCHAR)" if c == double_col else f"CAST({c} AS VARCHAR)"
                pieces.append(f"'{c}=' || {val}")
            return " || ',' || ".join(pieces)

        selects.append(f"""
        SELECT '{sink_table}' AS sink_table, CAST({row_key} AS VARCHAR) AS rowkey,
               'bootstrap-insert' AS op, CAST(0 AS BIGINT) AS ts, {kv()} AS kv
        FROM {table}""")
        selects.append(f"""
        SELECT '{sink_table}', CAST({row_key} AS VARCHAR), 'update', CAST(1 AS BIGINT),
               {kv(double_col=update_col)}
        FROM {table} WHERE {key_col} % 10000 < 500""")
        selects.append(f"""
        SELECT '{sink_table}', CAST({row_key} AS VARCHAR), 'delete', CAST(2 AS BIGINT), {kv()}
        FROM {table} WHERE {key_col} % 1000 = 7""")
    return "\nUNION ALL\n".join(selects)


@register("dim_config_routing", oracle=_dim_oracle_sql())
def dim_config_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed + pruned dim change rows (the stream that feeds the K6
    sink), serialized hash-stably."""
    routed = route_dim_changes(dim_changelog(spark, sf_dir), dim_config_df(spark))
    return routed.select(
        "sink_table", "rowkey", F.col("type").alias("op"), "ts",
        _kv_string().alias("kv"),
    )


def run_dim_pipeline(spark: SparkSession, sf_dir: str, warehouse_dir: str,
                     stream_input_dir: str | None = None) -> dict[str, DataFrame]:
    """End-to-end DIM maintenance: changelog → route → per-dim parquet
    tables with upsert + delete applied (the full DimApp).

    Batch-drive by default; pass stream_input_dir (staged change-row
    files) to run it through Structured Streaming foreachBatch instead
    — tests do both and compare.
    """
    from ..streaming.sinks import dim_upsert_batch

    apply_batch = dim_upsert_batch(warehouse_dir, key_expr="rowkey",
                                   table_col="sink_table", op_col="type")
    if stream_input_dir is None:
        routed = route_dim_changes(dim_changelog(spark, sf_dir), dim_config_df(spark))
        apply_batch(routed, 0)
    else:
        from ..streaming.runner import run_foreach_batch

        changes = (
            spark.readStream.schema(
                "database string, table string, type string, ts long, "
                "data map<string,string>, old map<string,string>"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_input_dir)
        )
        routed = route_dim_changes(changes, dim_config_df(spark))
        run_foreach_batch(
            routed, apply_batch,
            checkpoint_dir=os.path.join(warehouse_dir, "_checkpoint"),
            output_mode="append",
        )
    return {
        sink: spark.read.parquet(os.path.join(warehouse_dir, sink))
        for _, sink, *_ in DIM_CONFIG
    }


@register(
    "dim_sku_final_state",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS rowkey,
           'p_brand=' || p_brand
               || ',p_name=' || p_name
               || ',p_partkey=' || CAST(p_partkey AS VARCHAR)
               || ',p_size=' || CAST(CASE WHEN p_partkey % 10000 < 500
                                          THEN p_size * 2 ELSE p_size END AS VARCHAR)
               AS kv
    FROM part WHERE p_partkey % 1000 <> 7
    """,
)
def dim_sku_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 end-to-end in the correctness gate: run the FULL DIM
    maintenance pipeline (changelog → broadcast-config routing →
    per-table MERGE with latest-per-rowkey upserts AND deletes,
    DimHBaseSinkFunction.java:16-105) into a fresh warehouse dir, then
    return dim_sku_info's final state. The oracle replays the same
    bootstrap/update/delete synthesis as plain SQL over `part`:
    updated rows (partkey %10000 < 500) carry the doubled p_size,
    deleted rowkeys (%1000 == 7) are gone. This checks the MERGE
    semantics themselves, not just the routed change stream
    (dim_config_routing covers that)."""
    import tempfile

    wh = tempfile.mkdtemp(prefix="rdw_dimwh_")
    tables = run_dim_pipeline(spark, sf_dir, wh)
    return tables["dim_sku_info"].select("rowkey", _kv_string().alias("kv"))


@register(
    "stream_dim_sku_final_state",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS rowkey,
           'p_brand=' || p_brand
               || ',p_name=' || p_name
               || ',p_partkey=' || CAST(p_partkey AS VARCHAR)
               || ',p_size=' || CAST(CASE WHEN p_partkey % 10000 < 500
                                          THEN p_size * 2 ELSE p_size END AS VARCHAR)
               AS kv
    FROM part WHERE p_partkey % 1000 <> 7
    """,
)
def stream_dim_sku_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DIM pipeline driven through Structured Streaming foreachBatch
    (SURVEY §3.3's full path: CDC stream → broadcast-config routing →
    per-micro-batch MERGE with upserts AND deletes): the change rows
    replay as three ts-ordered micro-batches, so the MERGE must be
    correct incrementally — a bootstrap applied in batch 1 gets its
    update in batch 2 and its delete in batch 3, against the table
    state on disk, not an in-memory union. Same oracle as the batch
    twin dim_sku_final_state; matching hashes prove batch and
    streaming maintenance converge to identical warehouse state."""
    import tempfile

    from ..streaming.runner import staged_files_dir
    from .streaming_queries import _stage_once

    changes = dim_changelog(spark, sf_dir)
    stream_in = _stage_once(
        sf_dir, "dim_changelog",
        lambda base: staged_files_dir(changes, base, n_files=3,
                                      order_col="ts"),
    )
    wh = tempfile.mkdtemp(prefix="rdw_dimwh_stream_")
    tables = run_dim_pipeline(
        spark, sf_dir, os.path.join(wh, "wh"), stream_input_dir=stream_in
    )
    return tables["dim_sku_info"].select("rowkey", _kv_string().alias("kv"))
