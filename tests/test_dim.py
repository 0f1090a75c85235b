"""DIM layer golden tests (SURVEY §3.3, J4+P6+K6): config routing,
dynamic projection, upsert+delete maintenance — batch drive and
streaming drive must produce identical dim tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_data_warehouse_spark.oracle import check_query
from realtime_data_warehouse_spark.plans.dim import (
    dim_changelog,
    run_dim_pipeline,
)
from realtime_data_warehouse_spark.sources.batch import load_table
from realtime_data_warehouse_spark.streaming.runner import staged_files_dir


def test_dim_routing_oracle(spark, sf_small):
    ok, msg = check_query(spark, sf_small, "dim_config_routing")
    assert ok, msg


@pytest.mark.slow
def test_dim_pipeline_batch_vs_stream(spark, sf_small, tmp_path):
    wh_batch = str(tmp_path / "wh_batch")
    wh_stream = str(tmp_path / "wh_stream")

    batch_tables = run_dim_pipeline(spark, sf_small, wh_batch)

    # Stage the changelog as 3 ts-ordered files (bootstrap, update,
    # delete land in separate micro-batches — the realistic order).
    in_dir = staged_files_dir(
        dim_changelog(spark, sf_small), str(tmp_path), n_files=3, order_col="ts"
    )
    stream_tables = run_dim_pipeline(spark, sf_small, wh_stream,
                                     stream_input_dir=in_dir)

    for sink in batch_tables:
        b, s = batch_tables[sink], stream_tables[sink]
        assert b.count() == s.count(), sink
        bs = b.select("rowkey", F.to_json(F.map_entries("data")).alias("j"))
        ss = s.select("rowkey", F.to_json(F.map_entries("data")).alias("j"))
        assert bs.exceptAll(ss).count() == 0, sink
        assert ss.exceptAll(bs).count() == 0, sink


@pytest.mark.slow
def test_dim_pipeline_semantics(spark, sf_small, tmp_path):
    """Updates win over bootstrap, deleted keys are absent, surviving
    row count = |snapshot| − |deletes|."""
    wh = str(tmp_path / "wh")
    tables = run_dim_pipeline(spark, sf_small, wh)

    part = load_table(spark, sf_small, "part")
    sku = tables["dim_sku_info"]

    n_total = part.count()
    n_deleted = part.filter(F.col("p_partkey") % 1000 == 7).count()
    assert sku.count() == n_total - n_deleted
    assert sku.filter(F.col("rowkey").cast("long") % 1000 == 7).count() == 0

    # an updated, non-deleted key carries the doubled p_size
    row = (
        part.filter((F.col("p_partkey") % 10000 < 500) & (F.col("p_partkey") % 1000 != 7))
        .select("p_partkey", "p_size").first()
    )
    if row is not None:
        got = sku.filter(F.col("rowkey") == str(row.p_partkey)).first()
        assert got["data"]["p_size"] == str(row.p_size * 2)
    # pruning: only configured columns survive in the map
    keys = sku.select(F.explode(F.map_keys("data")).alias("k")).distinct()
    assert {r.k for r in keys.collect()} == {"p_brand", "p_name", "p_partkey", "p_size"}


def test_dim_merge_survives_schema_evolution(spark, tmp_path):
    """A later micro-batch may carry columns the stored dim table has
    never seen (CDC schema evolution — the reference's config-driven
    sink_columns can widen at runtime). The MERGE must keep old rows
    (new column NULL) and apply new rows without error."""
    from pyspark.sql import functions as F

    from realtime_data_warehouse_spark.streaming.sinks import dim_upsert_batch

    wh = str(tmp_path / "wh")
    fn = dim_upsert_batch(wh, key_expr="rowkey", table_col="sink_table",
                          op_col="type")
    b1 = spark.createDataFrame(
        [("dim_t", "1", "insert", 1, "alice")],
        "sink_table string, rowkey string, type string, ts long, name string",
    )
    b2 = spark.createDataFrame(
        [("dim_t", "2", "insert", 2, "bob", "new-col"),
         ("dim_t", "1", "update", 3, "alice2", "seen")],
        "sink_table string, rowkey string, type string, ts long, "
        "name string, extra string",
    )
    fn(b1, 0)
    fn(b2, 1)
    got = {r.rowkey: (r.name, r.extra)
           for r in spark.read.parquet(f"{wh}/dim_t").collect()}
    assert got == {"1": ("alice2", "seen"), "2": ("bob", "new-col")}
