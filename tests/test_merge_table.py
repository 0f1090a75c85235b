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


# ---------------------------------------------------------------------------
# Round 10 — narrow-batch schema conformance, first-merge crash meta,
# manifest snapshot reads, adaptive bucket growth + split-on-touch
# ---------------------------------------------------------------------------

def _bucket_of_keys(spark, vals, n):
    """key value -> bucket id under the engine's hash (computed with
    the same Spark expression the engine uses)."""
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    rows = df.select(
        "k", F.pmod(F.xxhash64(F.col("k")), F.lit(n)).cast("int").alias("b")
    ).collect()
    return {r.k: r.b for r in rows}


def test_narrow_batch_into_empty_bucket_keeps_wide_schema(spark, tmp_path):
    """A batch whose columns are a SUBSET of the stored schema and
    whose keys all land in EMPTY buckets (cur is None — nothing to
    unionByName against) must not write a narrow bucket file: plain
    spark.read.parquet would then silently drop the wide columns from
    every row (round-10 ADVICE medium). The merged frame is conformed
    to the stored schema with typed nulls and meta keeps the wide
    column set."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(
            rows, allowMissingColumns=True)
        return latest_per_key(merged, ["k"], "ts")

    n = 8
    wide = spark.createDataFrame(
        [(1, 0, 11, "a"), (2, 0, 22, "b")],
        "k long, ts long, attr long, extra string")
    BucketedMergeTable(table, ["k"], n_buckets=n).merge(wide, merge)

    buckets = _bucket_of_keys(spark, range(100), n)
    used = {buckets[1], buckets[2]}
    k_new = next(k for k, b in buckets.items() if b not in used)

    narrow = spark.createDataFrame([(k_new, 1)], "k long, ts long")
    BucketedMergeTable(table, ["k"]).merge(narrow, merge)

    got = spark.read.parquet(table)
    assert set(got.columns) == {"k", "ts", "attr", "extra"}
    rows = {r.k: (r.attr, r.extra) for r in got.collect()}
    assert rows[k_new] == (None, None)
    assert rows[1] == (11, "a") and len(rows) == 3

    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    assert set(meta["columns"]) == {"k", "ts", "attr", "extra"}


def test_first_merge_crash_preserves_meta_via_rollforward(spark, tmp_path):
    """A crash after the commit point of a table's FIRST merge leaves
    committed files whose meta exists only in the marker plan; the
    next construction must roll it forward BEFORE reading meta —
    otherwise it silently reverts to the constructor's bucket count
    and loses the schema-evolution probe (round-10 ADVICE low)."""
    import json

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

    with pytest.raises(Die):
        BucketedMergeTable(table, ["k"], n_buckets=16).merge(
            spark.createDataFrame([(1, 10)], "k long, v long"),
            merge, batch_id=0, ledgered=True, fault=fault)
    assert os.path.exists(os.path.join(table, "_pending.json"))
    assert not os.path.exists(os.path.join(table, "_table_meta.json"))

    # construct with a DIFFERENT bucket count: the rolled-forward meta
    # must win, not the constructor argument
    t2 = BucketedMergeTable(table, ["k"], n_buckets=4)
    assert t2.n_buckets == 16
    assert not os.path.exists(os.path.join(table, "_pending.json"))
    with open(os.path.join(table, "_table_meta.json")) as fh:
        assert json.load(fh)["n_buckets"] == 16
    assert "0" in t2.applied_batches()
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: 10}


@pytest.mark.parametrize("kill_point", ["after_live_aside",
                                        "after_tmp_in",
                                        "after_ledger_write"])
def test_manifest_read_sees_prebatch_snapshot_mid_crash(
        spark, tmp_path, kill_point):
    """read_table loads exactly the files the committed manifest
    names: a reader racing a crashed merge (marker published, any
    prefix of moves/ledger done, meta NOT yet flipped) sees exactly
    the pre-batch snapshot — even while the directory itself holds
    both old and new bucket files. After roll-forward it sees exactly
    the post-batch table."""
    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    table = str(tmp_path / "t")

    class Die(Exception):
        pass

    def fault(stage):
        if stage == kill_point:
            raise Die(stage)

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    t = BucketedMergeTable(table, ["k"], n_buckets=4)
    t.merge(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
            merge, batch_id=0, ledgered=True)

    with pytest.raises(Die):
        BucketedMergeTable(table, ["k"]).merge(
            spark.createDataFrame([(1, 1), (3, 30)], "k long, v long"),
            merge, batch_id=1, ledgered=True, fault=fault)
    assert os.path.exists(os.path.join(table, "_pending.json"))

    # mid-crash-window manifest read: exactly the pre-batch snapshot
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got == {1: 10, 2: 20}, (kill_point, got)

    # roll forward (construction recovers), then the new snapshot
    BucketedMergeTable(table, ["k"])
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got == {1: 11, 2: 20, 3: 30}


def test_growth_doubles_metadata_only_then_splits_on_touch(spark, tmp_path):
    """Growth is a metadata-only commit: passing the per-bucket row
    target doubles n_buckets without rewriting data (files keep their
    generation tag); a later merge that touches a child of an
    old-generation file consumes that file WHOLE and rewrites all its
    children under the current generation, leaving other old files
    untouched (split-on-touch)."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    base = spark.range(400).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    BucketedMergeTable(table, ["k"], n_buckets=4,
                       target_rows_per_bucket=50).merge(base, merge)

    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_buckets"] == 8, "400 rows / target 50 -> 8 buckets"
    gen4 = sorted(glob.glob(os.path.join(table, "b*-n00004-*.parquet")))
    assert len(gen4) == 4, "growth must NOT rewrite data files"

    # touch one key -> its old-generation file splits into BOTH its
    # children under gen 8; the other 3 gen-4 files are untouched
    t2 = BucketedMergeTable(table, ["k"])
    assert t2.n_buckets == 8
    t2.merge(spark.createDataFrame([(7, 1, 999)], "k long, ts long, v long"),
             merge)
    after = {os.path.basename(p)
             for p in glob.glob(os.path.join(table, "*.parquet"))}
    survivors4 = {os.path.basename(p) for p in gen4} & after
    assert len(survivors4) == 3, "exactly one old-gen file consumed"
    new8 = {n for n in after if "-n00008-" in n}
    assert len(new8) == 2, "consumed file splits into its two children"

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[7] == 999 and got[8] == 16 and len(got) == 400


def test_growth_and_split_survive_kill_points(spark, tmp_path):
    """The kill suite holds through growth and split merges: dying at
    the commit point of the GROWTH commit (the second marker of one
    merge call) or of a SPLIT merge rolls forward to the exact same
    table, with ledgered batches applied exactly once."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
    )

    table = str(tmp_path / "t")

    class Die(Exception):
        pass

    def die_on_nth(stage_name, nth):
        seen = {"n": 0}

        def fault(stage):
            if stage == stage_name:
                seen["n"] += 1
                if seen["n"] == nth:
                    raise Die(stage)
        return fault

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    rows = spark.range(400).select((F.col("id") % 200).alias("k"),
                                   F.lit(1).alias("v"))
    # merge commit passes (1st after_live_aside), growth commit dies
    # (2nd): marker on disk holds the doubling plan
    with pytest.raises(Die):
        BucketedMergeTable(table, ["k"], n_buckets=4,
                           target_rows_per_bucket=25).merge(
            rows, merge, batch_id=0, ledgered=True,
            fault=die_on_nth("after_live_aside", 2))
    assert os.path.exists(os.path.join(table, "_pending.json"))

    # replay after restart: construction rolls the growth forward,
    # ledger skips the batch
    t = BucketedMergeTable(table, ["k"])
    assert t.n_buckets == 8
    t.merge(rows, merge, batch_id=0, ledgered=True)
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[0] == 2 and len(got) == 200, "no double-apply"

    # split merge killed mid-commit: old-gen file consumed, children
    # written — roll forward, replay, exactly once
    inc = spark.createDataFrame([(7, 5)], "k long, v long")
    with pytest.raises(Die):
        BucketedMergeTable(table, ["k"]).merge(
            inc, merge, batch_id=1, ledgered=True,
            fault=die_on_nth("after_live_aside", 1))
    BucketedMergeTable(table, ["k"]).merge(
        inc, merge, batch_id=1, ledgered=True)
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[7] == 7 and got[0] == 2 and len(got) == 200
    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    # manifest matches the directory exactly after recovery
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(table, "*.parquet"))}
    assert set(meta["files"]) == on_disk


def test_point_lookup_prunes_to_key_buckets(spark, tmp_path):
    """Read-side pruning (round-10 stretch): a point lookup opens only
    the files whose (bucket, generation) serve the requested keys —
    including old-generation files after a growth — and returns
    exactly what a full-scan filter returns. Read amplification for
    an 8-key Get against a 64-bucket table is ≤ 8/64 of the files."""
    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        point_lookup,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    base = spark.range(2000).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    BucketedMergeTable(table, ["k"], n_buckets=64).merge(base, merge)
    total_files = len(glob.glob(os.path.join(table, "*.parquet")))
    assert total_files == 64

    keys = [3, 77, 501, 999, 1203, 1500, 1777, 1999]
    got = point_lookup(spark, table, keys)
    assert len(got.inputFiles()) <= 8, "must open at most one file/key"
    rows = {r.k: r.v for r in got.collect()}
    assert rows == {k: 2 * k for k in keys}

    # after growth, old-generation files still resolve
    t2 = BucketedMergeTable(table, ["k"], target_rows_per_bucket=10)
    t2.merge(spark.createDataFrame([(3, 1, -1)], "k long, ts long, v long"),
             merge)
    got2 = point_lookup(spark, table, keys)
    rows2 = {r.k: r.v for r in got2.collect()}
    assert rows2[3] == -1 and rows2[999] == 1998 and len(rows2) == 8

    # miss: empty result, not an error
    assert point_lookup(spark, table, [123456]).count() == 0


def test_time_travel_and_slow_reader_retention(spark, tmp_path):
    """Retention (round 10, Delta-gap): each commit archives the
    manifest + data files it replaces instead of deleting, keeping
    the last `retain_versions` snapshots fully readable —
    read_table(version=k) is time travel within the window, and a
    SLOW reader holding the previous manifest can still resolve every
    file it references a full commit later. Auto-vacuum drops
    anything older (bounded disk)."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        list_versions,
        read_table,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    t = BucketedMergeTable(table, ["k"], n_buckets=4)
    t.merge(spark.createDataFrame([(1, 0, 10), (2, 0, 20)],
                                  "k long, ts long, v long"), merge)
    t.merge(spark.createDataFrame([(1, 1, 11)],
                                  "k long, ts long, v long"), merge)

    # a slow reader picks up v2's manifest NOW…
    with open(os.path.join(table, "_table_meta.json")) as fh:
        held = json.load(fh)
    assert held["version"] == 2

    t.merge(spark.createDataFrame([(2, 2, 22)],
                                  "k long, ts long, v long"), merge)

    # …and every file it references is still readable after commit 3
    # (retired to _archive, not deleted)
    from realtime_data_warehouse_spark.streaming.merge_table import (
        _resolve_manifest_paths,
    )
    paths = _resolve_manifest_paths(table, held["files"])
    got_v2 = {r.k: r.v for r in spark.read.parquet(*paths).collect()}
    assert got_v2 == {1: 11, 2: 20}

    # time travel: default retention keeps the last 2 versions
    assert list_versions(table) == [2, 3]
    assert {r.k: r.v for r in read_table(spark, table, version=2)
            .collect()} == {1: 11, 2: 20}
    assert {r.k: r.v for r in read_table(spark, table).collect()} \
        == {1: 11, 2: 22}
    with pytest.raises(ValueError, match="not retained"):
        read_table(spark, table, version=1)

    # vacuum keeps disk bounded: archive holds only files referenced
    # by retained manifests
    import glob as g
    archived = {os.path.basename(p) for p in
                g.glob(os.path.join(table, "_archive", "*.parquet"))}
    retained_refs = set()
    for v in (2, 3):
        with open(os.path.join(table, "_meta_history",
                               f"{v:08d}.json")) as fh:
            retained_refs |= set(json.load(fh)["files"])
    assert archived <= retained_refs

    # deeper retention when asked: a fresh table with retain 3 keeps
    # all three versions
    table2 = str(tmp_path / "t2")
    t2 = BucketedMergeTable(table2, ["k"], n_buckets=4,
                            retain_versions=3)
    for i, rows in enumerate(([(1, 0, 10)], [(1, 1, 11)], [(1, 2, 12)])):
        t2.merge(spark.createDataFrame(rows, "k long, ts long, v long"),
                 merge)
    assert list_versions(table2) == [1, 2, 3]
    assert {r.v for r in read_table(spark, table2, version=1).collect()} \
        == {10}


def test_point_lookup_advice_fixes(spark, tmp_path):
    """Round-11 ADVICE closures on point_lookup: (a) a meta with NO
    file manifest (round-9 table before its first round-10 merge)
    falls back to a full directory read — rows that exist on disk are
    returned, not silently dropped by the no-serving-files limit(0)
    path; (b) lookup literals are hashed under the STORED key types —
    an IntegerType key column buckets identically at write and lookup
    time even though Python ints infer LongType; (c) an empty key set
    raises a clear ValueError instead of .filter(None)'s TypeError."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        point_lookup,
    )

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    # (b) int-typed key column: write-path hash is xxhash64(int)
    table = str(tmp_path / "t_int")
    rows = spark.range(64).select(
        F.col("id").cast("int").alias("k"),
        F.lit(0).cast("long").alias("ts"), (F.col("id") * 3).alias("v"))
    BucketedMergeTable(table, ["k"], n_buckets=16).merge(rows, merge)
    got = point_lookup(spark, table, 7).collect()
    assert [(r.k, r.v) for r in got] == [(7, 21)]

    # (c) empty key set
    with pytest.raises(ValueError, match="no lookup values"):
        point_lookup(spark, table, [])

    # (a) strip the manifest from meta (simulated round-9 meta)
    meta_path = os.path.join(table, "_table_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta.pop("files", None)
    meta.pop("file_rows", None)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    got = point_lookup(spark, table, 7).collect()
    assert [(r.k, r.v) for r in got] == [(7, 21)]


def test_legacy_rename_keeps_retained_manifests_readable(spark, tmp_path):
    """Round-11 ADVICE closure: growth's in-place rename of untagged
    round-9 file names is retire+add for manifest purposes — a
    hardlink of the UNTAGGED name lands in _archive/, so retained
    historical manifests (and a slow reader holding the pre-growth
    manifest) still resolve every file they reference after the
    upgrade. Before the fix, read_table(version=k) raised
    FileNotFoundError for versions inside the promised window."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    table = str(tmp_path / "t")
    t = BucketedMergeTable(table, ["k"], n_buckets=4,
                           target_rows_per_bucket=50, retain_versions=4)
    base = spark.range(60).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    t.merge(base, merge)

    # simulate a round-9 table: strip the generation tag from every
    # file name, in the directory AND in every manifest; drop the
    # growth target so the NEXT merge (a single key) triggers growth
    # while three untagged files survive untouched — exactly the
    # legacy-upgrade rename path the ADVICE flags
    renames = {}
    for p in glob.glob(os.path.join(table, "b*-n*-*.parquet")):
        name = os.path.basename(p)
        bucket_part = name.split("-", 1)[0]
        untagged = bucket_part + "-" + name.split("-", 2)[2]
        renames[name] = untagged
        os.replace(p, os.path.join(table, untagged))
    for mpath in ([os.path.join(table, "_table_meta.json")]
                  + glob.glob(os.path.join(table, "_meta_history",
                                           "*.json"))):
        with open(mpath) as fh:
            m = json.load(fh)
        m["files"] = sorted(renames.get(f, f) for f in m["files"])
        m["file_rows"] = {renames.get(f, f): n
                          for f, n in m["file_rows"].items()}
        m["target_rows_per_bucket"] = 10
        with open(mpath, "w") as fh:
            json.dump(m, fh)

    # a slow reader holds the pre-growth (untagged) manifest
    with open(os.path.join(table, "_table_meta.json")) as fh:
        held = json.load(fh)

    # one-key merge: touches ONE bucket, then growth (60 rows / 4
    # buckets > target 10) renames the three untagged survivors
    t2 = BucketedMergeTable(table, ["k"], retain_versions=4)
    t2.merge(spark.createDataFrame([(1, 1, 999)],
                                   "k long, ts long, v long"), merge)
    assert t2.n_buckets > 4, "growth must have fired"
    live = {os.path.basename(p)
            for p in glob.glob(os.path.join(table, "*.parquet"))}
    assert not any(n in live for n in renames.values()), \
        "growth must have renamed every untagged survivor"
    archived = {os.path.basename(p)
                for p in glob.glob(os.path.join(table, "_archive", "*"))}
    assert set(renames.values()) <= archived, \
        "every untagged name must stay resolvable in the archive"

    # pre-growth versions (which reference untagged names) stay
    # readable inside the retention window…
    assert {r.k: r.v
            for r in read_table(spark, table, version=1).collect()} \
        == {k: 2 * k for k in range(60)}
    # …and so does the slow reader's held manifest
    from realtime_data_warehouse_spark.streaming.merge_table import (
        _resolve_manifest_paths,
    )
    paths = _resolve_manifest_paths(table, held["files"])
    assert {r.k: r.v for r in spark.read.parquet(*paths).collect()} \
        == {k: 2 * k for k in range(60)}
    # current read is the merged state
    cur = {r.k: r.v for r in read_table(spark, table).collect()}
    assert cur[1] == 999 and cur[2] == 4 and len(cur) == 60


def test_concurrent_writers_converge_to_serialized_hash(spark, tmp_path):
    """Multi-writer arbitration (round 11, the last Delta-txn-log
    gap): two writers interleaving ledgered additive merges into ONE
    table — each building its own BucketedMergeTable per batch, the
    foreachBatch pattern — converge to exactly the serialized result.
    The commit CAS serializes manifest versions (one commit per
    version, no lost updates), and every batch applies exactly once."""
    import json
    import threading

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        list_versions,
        read_table,
    )

    table = str(tmp_path / "t")
    keys = list(range(100))

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    errors = []

    def writer(tag, inc, n_batches):
        try:
            for i in range(n_batches):
                rows = spark.createDataFrame([(k, inc) for k in keys],
                                             "k long, v long")
                BucketedMergeTable(table, ["k"], n_buckets=8).merge(
                    rows, merge, batch_id=f"{tag}-{i}", ledgered=True)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=writer, args=("a", 1, 5))
    tb = threading.Thread(target=writer, args=("b", 2, 5))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors

    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got == {k: 5 * 1 + 5 * 2 for k in keys}

    # every commit got its own manifest version — no lost updates
    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["version"] == 10
    # ledger holds every batch exactly once
    with open(os.path.join(table, "_applied_batches")) as fh:
        ids = fh.read().split()
    assert sorted(ids) == sorted(f"{t}-{i}" for t in "ab" for i in range(5))
    # retention machinery kept working under contention
    assert len(list_versions(table)) >= 1


def test_commit_cas_retries_on_stale_manifest(spark, tmp_path):
    """Deterministic lost race: writer 1 finishes its merge
    computation (after_data_write), then writer 2 commits — writer
    1's commit CAS must fail, and it must re-merge against writer 2's
    manifest and commit on the retry (conflicts_seen == 1), with the
    final table equal to both batches applied."""
    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    BucketedMergeTable(table, ["k"], n_buckets=8).merge(
        spark.createDataFrame([(k, 10) for k in range(20)],
                              "k long, v long"), merge)

    t1 = BucketedMergeTable(table, ["k"])
    fired = {"done": False}

    def interleave(stage):
        # writer 2 slips in AFTER writer 1 computed its merge output
        # but BEFORE writer 1's commit claim
        if stage == "after_data_write" and not fired["done"]:
            fired["done"] = True
            BucketedMergeTable(table, ["k"]).merge(
                spark.createDataFrame([(0, 100)], "k long, v long"),
                merge)

    t1.merge(spark.createDataFrame([(1, 1000)], "k long, v long"),
             merge, fault=interleave)
    assert t1.conflicts_seen == 1, "the lost race must be observed"

    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[0] == 110 and got[1] == 1010 and got[2] == 10


def test_concurrent_writer_takes_over_dead_writers_commit(spark, tmp_path):
    """Kill mid-commit with a SECOND writer doing the recovery: writer
    A dies after publishing its marker (the commit point); writer B's
    next merge — a different table object, the other-process shape —
    rolls A's commit forward under the lock before its own, so the
    final table holds BOTH batches and A's ledgered batch applies
    exactly once. Also: dying before the claim (after_data_write)
    publishes nothing and leaves only dead-pid tmp garbage, which the
    next writer sweeps."""
    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    table = str(tmp_path / "t")

    class Die(Exception):
        pass

    def die_at(stage_name):
        def fault(stage):
            if stage == stage_name:
                raise Die(stage)
        return fault

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    base = spark.createDataFrame([(k, 1) for k in range(50)],
                                 "k long, v long")
    BucketedMergeTable(table, ["k"], n_buckets=8).merge(
        base, merge, batch_id="base", ledgered=True)

    # writer A dies at the commit point: marker published, flock
    # released by the unwind (as by process death)
    with pytest.raises(Die):
        BucketedMergeTable(table, ["k"]).merge(
            spark.createDataFrame([(7, 100)], "k long, v long"),
            merge, batch_id="A", ledgered=True,
            fault=die_at("after_live_aside"))
    assert os.path.exists(os.path.join(table, "_pending.json"))

    # writer B merges: takes the lock, rolls A forward, applies its own
    BucketedMergeTable(table, ["k"]).merge(
        spark.createDataFrame([(8, 200)], "k long, v long"),
        merge, batch_id="B", ledgered=True)
    assert not os.path.exists(os.path.join(table, "_pending.json"))
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[7] == 101 and got[8] == 201 and got[0] == 1

    # replaying A after the takeover is a no-op (exactly once)
    BucketedMergeTable(table, ["k"]).merge(
        spark.createDataFrame([(7, 100)], "k long, v long"),
        merge, batch_id="A", ledgered=True)
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[7] == 101


def test_skew_trigger_grows_on_hot_bucket_and_caps_on_hot_key(
        spark, tmp_path):
    """Round-11 skew trigger: a MULTI-row-per-key table (history
    shape) whose hot key concentrates rows in one bucket grows even
    though the mean sleeps (max-bucket > 2× target fires a single
    doubling); and once the hot bucket is essentially one KEY — which
    no bucket count can split — growth stops at the 4×-mean cap
    instead of doubling away to MAX_BUCKETS."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.dropDuplicates(["k", "seq"])

    # 400 rows over 8 buckets, target 100: mean 50 — the mean trigger
    # sleeps. Key 0 carries 300 rows -> its bucket reads ~300 > 2x100.
    hot = spark.range(300).select(
        F.lit(0).cast("long").alias("k"), F.col("id").alias("seq"))
    cold = spark.range(1, 101).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("seq"))
    t = BucketedMergeTable(table, ["k"], n_buckets=8,
                           target_rows_per_bucket=100)
    t.merge(hot.unionByName(cold), merge)
    with open(os.path.join(table, "_table_meta.json")) as fh:
        assert json.load(fh)["n_buckets"] == 16, \
            "skew must fire one doubling while the mean sleeps"

    # touch the hot key: its gen-8 file splits, the hot child still
    # reads ~300 rows — but the 4x-mean cap (pow2(4*400/100) = 16)
    # blocks further doubling: one hot KEY is unsplittable, so the
    # honest stop is the cap, not MAX_BUCKETS
    t2 = BucketedMergeTable(table, ["k"])
    t2.merge(spark.createDataFrame([(0, 0)], "k long, seq long"), merge)
    with open(os.path.join(table, "_table_meta.json")) as fh:
        assert json.load(fh)["n_buckets"] == 16, \
            "hot-KEY skew must not grow past the 4x-mean cap"

    assert read_table(spark, table).count() == 400


def test_compact_migrates_grown_table_and_survives_kill(spark, tmp_path):
    """Bucket-aware compaction (round 11): after a growth event the
    table carries old-generation files that each serve several
    current buckets; optimize_table (delegating to compact) rewrites
    every such bucket into exactly one current-generation file —
    data identical, point_lookup back to ≤1 file per key, replaced
    fragments retired under retention — and a kill at the commit
    point rolls forward like any merge. A second compact is a no-op
    (returns 0 without running a Spark job)."""
    import json

    from realtime_data_warehouse_spark.operators.maintenance import (
        optimize_table,
    )
    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        point_lookup,
        read_table,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    base = spark.range(400).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    BucketedMergeTable(table, ["k"], n_buckets=4,
                       target_rows_per_bucket=50).merge(base, merge)
    with open(os.path.join(table, "_table_meta.json")) as fh:
        nb = json.load(fh)["n_buckets"]
    assert nb == 8, "growth must have fired (metadata-only)"
    before = {os.path.basename(p)
              for p in glob.glob(os.path.join(table, "*.parquet"))}
    assert all("-n00004-" in n for n in before), \
        "pre-compact files are all old-generation"

    rewritten = optimize_table(spark, table)
    assert rewritten == 8, "every bucket was served by an old-gen file"
    after = {os.path.basename(p)
             for p in glob.glob(os.path.join(table, "*.parquet"))}
    assert all("-n00008-" in n for n in after), \
        "post-compact files are all current-generation"
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got == {k: 2 * k for k in range(400)}
    # read amplification: a one-key Get now opens exactly one
    # single-bucket file (pre-compact it opened a 2-bucket file)
    assert [(r.k, r.v) for r in point_lookup(spark, table, 7).collect()] \
        == [(7, 14)]
    # idempotent: nothing fragmented remains
    assert BucketedMergeTable(table, ["k"]).compact(spark) == 0

    # kill at the commit point mid-compact: next writer rolls forward
    table2 = str(tmp_path / "t2")
    BucketedMergeTable(table2, ["k"], n_buckets=4,
                       target_rows_per_bucket=50).merge(base, merge)

    class Die(Exception):
        pass

    def die(stage):
        if stage == "after_live_aside":
            raise Die(stage)

    with pytest.raises(Die):
        BucketedMergeTable(table2, ["k"]).compact(spark, fault=die)
    assert os.path.exists(os.path.join(table2, "_pending.json"))
    # any construction rolls it forward; the table reads complete
    assert BucketedMergeTable(table2, ["k"]).compact(spark) == 0
    got2 = {r.k: r.v for r in read_table(spark, table2).collect()}
    assert got2 == {k: 2 * k for k in range(400)}
    after2 = {os.path.basename(p)
              for p in glob.glob(os.path.join(table2, "*.parquet"))}
    assert all("-n00008-" in n for n in after2)


def test_manifest_stats_prune_skips_cold_buckets(spark, tmp_path):
    """Round-11 stretch: per-file column min/max ride the manifest
    (committed transactionally with the files — never stale, gathered
    from the same footer open that counts rows), and read_pruned
    skips every bucket file whose envelope misses the range. The
    merge-table shape this serves: CDC touches a SUBSET of buckets
    per window, so cold buckets' max(ts) ages out and a recent-ts
    scan opens only the recently-touched files. Exact file-skip
    counts pinned; stats survive growth and compaction commits."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_pruned,
        read_table,
        stats_pruned_files,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    t = BucketedMergeTable(table, ["k"], n_buckets=16, stats_cols=["ts"])
    base = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    t.merge(base, merge)  # every bucket: ts in [0, 9]

    # a later CDC batch touches exactly the buckets of 2 keys at ts 100
    cdc = spark.createDataFrame([(7, 100, 700), (8, 100, 800)],
                                "k long, ts long, v long")
    t.merge(cdc, merge)
    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    hot_files = {f for f, st in meta["file_stats"].items()
                 if st["ts"][1] >= 100}
    assert 1 <= len(hot_files) <= 2, meta["file_stats"]

    keep, total = stats_pruned_files(table, "ts", lo=50)
    assert total == 16 and set(keep) == hot_files, \
        "recent-ts scan must open only the CDC-touched bucket files"
    got = {r.k: r.v for r in read_pruned(spark, table, "ts",
                                         lo=50).collect()}
    assert got == {7: 700, 8: 800}
    # envelope is an upper bound: residual filter still applies
    assert read_pruned(spark, table, "ts", lo=9, hi=9).count() == \
        read_table(spark, table).filter("ts = 9").count()

    # a disjoint range below every envelope prunes to nothing
    keep0, _ = stats_pruned_files(table, "ts", lo=500)
    assert keep0 == []
    assert read_pruned(spark, table, "ts", lo=500).count() == 0


def _occ_worker(table_dir: str, widx: int, n_commits: int) -> None:
    """Cross-PROCESS OCC worker: hand-built one-file commit plans
    through the real _commit CAS loop — no Spark needed, the commit
    protocol is pure filesystem."""
    import os as _os

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
    )

    t = BucketedMergeTable(table_dir, ["k"], n_buckets=32)
    for i in range(n_commits):
        for _attempt in range(200):
            t.recover()
            t._reload_from_disk()
            name = f"b{widx:05d}-n00032-w{widx}c{i}-0.parquet"
            tmp_rel = f".tmp-{_os.getpid()}-w{widx}c{i}"
            d = _os.path.join(table_dir, tmp_rel)
            _os.makedirs(d, exist_ok=True)
            with open(_os.path.join(d, "f.parquet"), "wb") as fh:
                fh.write(b"x")  # content never read by the protocol
            files_rows = dict(t.file_rows)
            files_rows[name] = 1
            plan = {
                "tmp": tmp_rel,
                "moves": [[f"{tmp_rel}/f.parquet", name]],
                "retire": [],
                "ledger_batch": f"w{widx}-{i}",
                "meta": t._meta_dict(files_rows),
            }
            if t._commit(plan, lambda _s: None,
                         expected_version=t.version):
                break
        else:
            raise RuntimeError("starved")


def test_cross_process_commit_arbitration(tmp_path):
    """Two OS PROCESSES (not threads) hammer one table with 20 CAS
    commits each: the flock + version CAS must serialize them to
    exactly 40 manifest versions with every commit's file and ledger
    entry present — no lost updates, no torn manifests. Pure
    filesystem (no Spark session per process), so this pins the
    cross-process semantics of the lock itself."""
    import json
    import multiprocessing as mp

    table = str(tmp_path / "t")
    os.makedirs(table)

    ctx = mp.get_context("spawn")
    ps = [ctx.Process(target=_occ_worker, args=(table, w, 20))
          for w in (1, 2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join(180)
        assert p.exitcode == 0, f"worker failed: {p.exitcode}"

    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["version"] == 40, "every commit claims its own version"
    assert len(meta["files"]) == 40
    with open(os.path.join(table, "_applied_batches")) as fh:
        ids = set(fh.read().split())
    assert ids == {f"w{w}-{i}" for w in (1, 2) for i in range(20)}
    assert not os.path.exists(os.path.join(table, "_pending.json"))


def test_compact_racing_concurrent_merge_converges(spark, tmp_path):
    """Compaction and a merge racing on one table must serialize via
    the commit CAS: whichever loses re-reads and retries, and the
    final table holds both effects — the merge's rows and a fully
    current-generation layout (or a layout the next compact finishes
    for free). Deterministic interleave via the fault hook: the
    compact computes its rewrite, then a merge commits first."""
    import json

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        from realtime_data_warehouse_spark.operators.state import (
            latest_per_key,
        )
        merged = rows if cur is None else cur.unionByName(rows)
        return latest_per_key(merged, ["k"], "ts")

    base = spark.range(400).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("ts"),
        (F.col("id") * 2).alias("v"))
    BucketedMergeTable(table, ["k"], n_buckets=4,
                       target_rows_per_bucket=50).merge(base, merge)
    # growth fired: files one generation behind -> compact has work
    t = BucketedMergeTable(table, ["k"])
    fired = {"done": False}

    def interleave(stage):
        if stage == "after_data_write" and not fired["done"]:
            fired["done"] = True
            BucketedMergeTable(table, ["k"]).merge(
                spark.createDataFrame([(7, 1, 999)],
                                      "k long, ts long, v long"), merge)

    rewritten = t.compact(spark, fault=interleave)
    assert rewritten > 0
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[7] == 999 and got[0] == 0 and len(got) == 400
    # after the dust settles one more compact leaves zero fragments
    BucketedMergeTable(table, ["k"]).compact(spark)
    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    nb = meta["n_buckets"]
    assert all(f"-n{nb:05d}-" in f for f in meta["files"])
    got2 = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got2 == got


def test_growth_commit_lost_race_is_skipped_not_corrupted(spark, tmp_path):
    """_maybe_grow's CAS: if another writer commits between a merge's
    commit and its growth check, the growth is dropped (reloaded
    state, no marker published) and simply fires on a later merge —
    never a half-applied doubling. Interleave via the growth commit's
    own fault hook (fires inside _commit after the version check, so
    we inject BEFORE by committing during the merge's
    after_ledger_write stage — the stage between the merge commit
    and the growth commit is not observable, so instead we pin the
    behavioral contract: concurrent merges that BOTH qualify for
    growth still end at a consistent bucket count and identical
    data)."""
    import json
    import threading

    from realtime_data_warehouse_spark.streaming.merge_table import (
        BucketedMergeTable,
        read_table,
    )

    table = str(tmp_path / "t")

    def merge(cur, rows):
        merged = rows if cur is None else cur.unionByName(rows)
        return merged.groupBy("k").agg(F.sum("v").alias("v"))

    errors = []

    def writer(tag, lo, hi):
        try:
            rows = spark.range(lo, hi).select(
                F.col("id").alias("k"), F.lit(1).alias("v"))
            BucketedMergeTable(table, ["k"], n_buckets=4,
                               target_rows_per_bucket=50).merge(
                rows, merge, batch_id=tag, ledgered=True)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    # both batches push the table past the growth target concurrently
    ta = threading.Thread(target=writer, args=("a", 0, 300))
    tb = threading.Thread(target=writer, args=("b", 300, 600))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors

    with open(os.path.join(table, "_table_meta.json")) as fh:
        meta = json.load(fh)
    # 600 rows / target 50 -> the mean trigger wants >= 16 buckets;
    # whichever writer's growth won, the count is a power of two and
    # every manifest file's generation divides it
    nb = meta["n_buckets"]
    assert nb >= 8 and (nb & (nb - 1)) == 0
    import re as _re
    for f in meta["files"]:
        gen = int(_re.match(r"^b\d{5}-n(\d{5})-", f).group(1))
        assert nb % gen == 0
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got == {k: 1 for k in range(600)}


def test_commit_lock_timeout_raises_instead_of_deadlocking(tmp_path):
    """A writer wedged (alive, holding the flock, not finishing) must
    not deadlock every other writer forever: acquisition gives up
    after LOCK_TIMEOUT_S with a clear TimeoutError. Pure filesystem."""
    import fcntl
    import time as _time

    from realtime_data_warehouse_spark.streaming import merge_table as MT

    table = str(tmp_path / "t")
    os.makedirs(table)
    t = MT.BucketedMergeTable(table, ["k"], n_buckets=4)

    # an external holder (same process, separate fd = separate lock
    # owner) grabs the commit lock and never releases
    fd = os.open(os.path.join(table, "_commit.lock"),
                 os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    old = MT.LOCK_TIMEOUT_S
    MT.LOCK_TIMEOUT_S = 0.2
    try:
        t0 = _time.monotonic()
        with pytest.raises(TimeoutError, match="commit lock"):
            t.recover()
        assert _time.monotonic() - t0 < 5
    finally:
        MT.LOCK_TIMEOUT_S = old
        os.close(fd)
    # holder gone (fd closed releases the flock): next acquisition wins
    t.recover()


def test_additive_multiwriter_needs_writer_id_namespace(spark, tmp_path):
    """Round 11: the additive sink's exactly-once ledger is per TABLE
    but foreachBatch ids are per QUERY — two queries feeding one
    table MUST namespace their ids via writer_id or the second
    query's batch 0 reads as a replay of the first's and silently
    skips. Both behaviors pinned: with writer_ids the sums include
    every batch from both writers; without, the collision loses a
    batch (the documented hazard, asserted so a future change that
    silently alters ledger semantics fails here)."""
    from realtime_data_warehouse_spark.streaming.sinks import (
        additive_merge_batch,
    )

    rows = spark.createDataFrame([(k, 1) for k in range(20)],
                                 "k long, v long")

    # namespaced: writer A batch 0 + writer B batch 0 both apply
    good = str(tmp_path / "good")
    fa = additive_merge_batch(good, keys=["k"], sum_cols=["v"],
                              writer_id="qa")
    fb = additive_merge_batch(good, keys=["k"], sum_cols=["v"],
                              writer_id="qb")
    fa(rows, 0)
    fb(rows, 0)
    got = {r.k: r.v for r in spark.read.parquet(good).collect()}
    assert got == {k: 2 for k in range(20)}
    # replay within a writer still dedups
    fa(rows, 0)
    got = {r.k: r.v for r in spark.read.parquet(good).collect()}
    assert got == {k: 2 for k in range(20)}

    # un-namespaced collision: writer B's batch 0 is skipped
    bad = str(tmp_path / "bad")
    ga = additive_merge_batch(bad, keys=["k"], sum_cols=["v"])
    gb = additive_merge_batch(bad, keys=["k"], sum_cols=["v"])
    ga(rows, 0)
    gb(rows, 0)
    got = {r.k: r.v for r in spark.read.parquet(bad).collect()}
    assert got == {k: 1 for k in range(20)}, \
        "id collision must skip (the documented single-query contract)"
