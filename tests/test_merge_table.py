"""Bucketed merge-table physics (round 9): the merge sinks must
rewrite ONLY the buckets a batch's keys touch — the property that
turns the O(table)-per-batch parquet MERGE into
O(batch + table·touched/n_buckets) and makes a 24/7 upsert stream
viable against a growing table (VERDICT r8 item 1). Output semantics
are already pinned by the sink tests in test_streaming.py; these
tests pin the PHYSICAL claims: untouched files untouched, legacy
layouts upgraded, schema evolution forcing the one-time full rewrite,
and plain-reader compatibility."""

import glob
import os

import pytest

from pyspark.sql import functions as F


def _files(table_dir):
    """name -> (size, mtime_ns) for every visible data file."""
    out = {}
    for p in glob.glob(os.path.join(table_dir, "*.parquet")):
        st = os.stat(p)
        out[os.path.basename(p)] = (st.st_size, st.st_mtime_ns)
    return out


def test_upsert_touches_only_key_buckets(spark, tmp_path):
    from realtime_data_warehouse_spark.streaming.sinks import upsert_batch

    table = str(tmp_path / "t")
    fn = upsert_batch(table, keys=["k"], order_col="ts", n_buckets=16)
    base = spark.range(200).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    fn(base, 0)
    before = _files(table)
    # 200 keys over 16 buckets: every bucket holds rows
    assert len(before) == 16

    # update ONE key -> exactly one bucket file replaced
    fn(spark.createDataFrame([(7, 1, 999)], "k long, ts long, v long"), 1)
    after = _files(table)
    assert len(after) == 16
    changed = {n for n in before if n not in after}
    added = {n for n in after if n not in before}
    assert len(changed) == 1 and len(added) == 1, (changed, added)
    survivors = set(before) & set(after)
    assert len(survivors) == 15
    # survivors are the SAME physical files — never rewritten in place
    assert all(before[n] == after[n] for n in survivors)

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[7] == 999 and got[8] == 16 and len(got) == 200


def test_legacy_flat_table_upgrades_in_place(spark, tmp_path):
    """A table written by the old whole-table layout (plain part-*
    files) is folded into the bucketed layout by the first merge: one
    full rewrite, then touched-bucket behavior."""
    from realtime_data_warehouse_spark.streaming.sinks import upsert_batch

    table = str(tmp_path / "t")
    spark.createDataFrame([(1, 0, 10), (2, 0, 20)],
                          "k long, ts long, v long") \
        .coalesce(1).write.parquet(table)
    assert glob.glob(os.path.join(table, "part-*"))

    fn = upsert_batch(table, keys=["k"], order_col="ts", n_buckets=8)
    fn(spark.createDataFrame([(2, 1, 99)], "k long, ts long, v long"), 0)
    # legacy files gone, only bucket-named files remain
    assert not glob.glob(os.path.join(table, "part-*"))
    assert all(os.path.basename(p).startswith("b")
               for p in glob.glob(os.path.join(table, "*.parquet")))
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: 10, 2: 99}


def test_dim_schema_evolution_forces_full_rewrite(spark, tmp_path):
    """dim_upsert_batch: a batch that widens the schema rewrites ALL
    buckets so stored files stay schema-uniform (plain readers never
    need mergeSchema); steady-state narrow batches stay partial."""
    from realtime_data_warehouse_spark.streaming.sinks import (
        dim_upsert_batch,
    )

    wh = str(tmp_path / "wh")
    fn = dim_upsert_batch(wh)
    rows1 = spark.range(50).select(
        F.col("id").cast("string").alias("rowkey"),
        F.lit("dim_a").alias("sink_table"), F.lit(0).alias("ts"),
        F.lit("insert").alias("type"), F.col("id").alias("attr"))
    fn(rows1, 0)
    tdir = os.path.join(wh, "dim_a")
    before = _files(tdir)

    # widening batch: adds column `extra` -> every file rewrites
    rows2 = spark.createDataFrame(
        [("3", "dim_a", 1, "update", 333, "x")],
        "rowkey string, sink_table string, ts long, type string, "
        "attr long, extra string")
    fn(rows2, 1)
    after = _files(tdir)
    assert not set(before) & set(after)  # full rewrite
    dim = spark.read.parquet(tdir)
    assert set(dim.columns) >= {"rowkey", "ts", "attr", "extra"}
    got = {r.rowkey: (r.attr, r.extra) for r in dim.collect()}
    assert got["3"] == (333, "x")
    assert got["4"] == (4, None) and len(got) == 50

    # steady-state narrow batch afterwards: partial again
    rows3 = spark.createDataFrame(
        [("5", "dim_a", 2, "update", 555, "y")],
        "rowkey string, sink_table string, ts long, type string, "
        "attr long, extra string")
    before = _files(tdir)
    fn(rows3, 2)
    after = _files(tdir)
    assert set(before) & set(after), "narrow batch must stay partial"


def test_additive_partial_equals_full_recompute(spark, tmp_path):
    """Three overlapping micro-batches through the bucketed additive
    sink equal the one-shot groupBy, and per-batch work stays
    proportional to touched buckets (untouched files survive)."""
    from realtime_data_warehouse_spark.streaming.sinks import (
        additive_merge_batch,
    )

    table = str(tmp_path / "agg")
    fn = additive_merge_batch(table, keys=["k"], sum_cols=["v"])
    wide = spark.range(300).select((F.col("id") % 100).alias("k"),
                                   F.lit(1).alias("v"))
    fn(wide, 0)
    before = _files(table)
    narrow = spark.createDataFrame([(7, 5), (7, 5)], "k long, v long")
    fn(narrow, 1)
    after = _files(table)
    assert set(before) & set(after), "untouched buckets must survive"
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[7] == 13 and got[8] == 3 and len(got) == 100
    # ledger replay: exactly-once even through the bucketed path
    fn(narrow, 1)
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[7] == 13


def test_marker_rollforward_is_idempotent(spark, tmp_path):
    """Crash right at the commit point (marker published, nothing
    moved): the next merge must roll the ENTIRE commit forward —
    files, ledger, deletes — before its own ledger check, so the
    replayed batch skips."""
    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
    )

    table = str(tmp_path / "t")

    class Die(Exception):
        pass

    def fault(stage):
        if stage == "after_live_aside":
            raise Die(stage)

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    t = BucketedMergeTable(table, ["k"], n_buckets=4)
    t.merge(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
            merge, batch_id=0, ledgered=True)
    with pytest.raises(Die):
        BucketedMergeTable(table, ["k"]).merge(
            spark.createDataFrame([(1, 1)], "k long, v long"),
            merge, batch_id=1, ledgered=True, fault=fault)
    assert os.path.exists(os.path.join(table, "_pending.json"))
    # replay of batch 1: recovery completes the commit, ledger skips
    BucketedMergeTable(table, ["k"]).merge(
        spark.createDataFrame([(1, 1)], "k long, v long"),
        merge, batch_id=1, ledgered=True)
    assert not os.path.exists(os.path.join(table, "_pending.json"))
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: 11, 2: 20}
