"""Hash-bucketed parquet MERGE tables — touched-bucket rewrites.

The round-8 merge sinks (streaming/sinks.py: upsert / dim-upsert /
additive / SCD2) were correct but O(table) per micro-batch: every
batch read + merged + rewrote the WHOLE stored table. That is the one
plan shape that cannot survive a 24/7 stream against a growing table —
at 100× the dim table a 5-second trigger rewrites the world every 5
seconds. The production fix is a transactional table format's keyed
``MERGE INTO`` (Delta/Iceberg rewrite only files whose key ranges
match), but the MECHANISM needs no Delta: hash-partition the stored
rows by merge key into a fixed set of buckets, and each batch rewrites
ONLY the buckets its keys fall in. Per-batch cost drops from O(table)
to O(batch + table · touched/n_buckets); a small CDC batch against a
huge table touches few buckets and the rest of the table is never
read, never written. Reference anchor: this is the scale story of the
reference's HBase dim sink (DimHBaseSinkFunction.java:16-105 — a Put
touches one rowkey region, not the table); the bucket is our region.

Layout — chosen so PLAIN ``spark.read.parquet(table_dir)`` keeps
working for every existing reader, with zero schema pollution:

    table_dir/
      b00007-<batchtoken>-0.parquet   data files, FLAT, bucket id
                                      encoded in the file NAME
      _table_meta.json                n_buckets, key + column names
      _applied_batches                batch-id ledger (additive sinks)
      _pending.json                   commit marker (exists only
                                      mid-commit; drives roll-forward)
      .tmp-<batchtoken>/              Spark output dir during a merge

Names starting with ``_`` / ``.`` are hidden from Spark's file index,
so the ledger, meta, marker and in-flight tmp dirs are invisible to
readers; the visible table is exactly the committed bucket files. The
bucket id is in the FILENAME (not a hive ``__b=`` dir) so readers see
the data schema unchanged; the merge path globs ``b00007-*`` to read
one bucket.

Crash safety — commit-marker roll-forward (single writer, the
foreachBatch contract). A merge publishes in stages:

  1. write the merged touched buckets under ``.tmp-*`` (invisible);
  2. atomically publish ``_pending.json`` — the COMMIT POINT — listing
     every file move, every old file to delete, and the batch id;
  3. move the new bucket files in (os.replace, same filesystem);
  4. append the batch id to the ledger (ledger sinks);
  5. delete the replaced old files, drop tmp, remove the marker.

A crash before (2) leaves only hidden garbage: recovery deletes orphan
tmp dirs and the batch replays in full. A crash anywhere after (2) is
rolled FORWARD by recovery at the next merge: every listed move whose
source still exists is completed (moves are idempotent — a missing
source means that file already moved), the ledger append is re-applied
(append is a set union), the old-file deletes re-run (missing = done),
then the marker drops. So the ledger invariant the round-7 kill suite
pins — visible data from a batch implies the ledger will contain that
batch before the next merge reads it — holds exactly as it did for
the rename-aside whole-table swap, and the same four kill points fire
at the analogous stages (see `merge`'s fault labels).

Consistency note (unchanged trade from the whole-table swap): the
publish is atomic per FILE, not per table — a reader racing a crash
window can see a bucket twice. The foreachBatch single-writer contract
plus read-after-drain usage makes that unobservable here; concurrent
readers are what a Delta/Iceberg txn log buys.

Schema evolution: a batch whose merged output adds column names the
stored table lacks (dim bootstrap) forces a one-time FULL merge — all
buckets rewrite under the new schema, so bucket files stay mutually
consistent and plain readers never need mergeSchema. Steady-state
per-key traffic takes the touched-bucket path.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META = "_table_meta.json"
_LEDGER = "_applied_batches"
_MARKER = "_pending.json"
_BCOL = "__b"

#: Default bucket count. Sized so a typical CDC micro-batch (tens to a
#: few thousand distinct keys) still leaves most buckets untouched
#: while each bucket stays a healthy parquet file size up to ~10^8-row
#: tables; callers with bigger tables raise it at table creation (the
#: count is frozen in _table_meta.json — changing it would orphan
#: existing files' name→bucket mapping).
DEFAULT_BUCKETS = 32


def _bucket_of(keys: Sequence[str], n: int):
    # xxhash64 is seed-fixed and stable across sessions/versions we
    # target, so file→bucket assignment survives restarts.
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                  F.lit(n)).cast("int")


def _bucket_glob(table_dir: str, b: int) -> list[str]:
    return sorted(_glob.glob(os.path.join(table_dir, f"b{b:05d}-*.parquet")))


def _data_files(table_dir: str) -> list[str]:
    return sorted(
        p for p in _glob.glob(os.path.join(table_dir, "*"))
        if os.path.isfile(p)
        and not os.path.basename(p).startswith(("_", "."))
    )


def _legacy_files(table_dir: str) -> list[str]:
    """Visible data files NOT written by this engine (an old
    whole-table layout being upgraded in place)."""
    import re
    pat = re.compile(r"^b\d{5}-")
    return [p for p in _data_files(table_dir)
            if not pat.match(os.path.basename(p))]


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".partial"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


class BucketedMergeTable:
    """One merge-maintained parquet table. Construct per foreachBatch
    call (stateless — all state is on disk), then ``merge`` the batch.
    """

    def __init__(self, table_dir: str, keys: Sequence[str],
                 n_buckets: int = DEFAULT_BUCKETS):
        self.table_dir = table_dir.rstrip("/")
        self.keys = list(keys)
        self.n_buckets = n_buckets
        os.makedirs(self.table_dir, exist_ok=True)
        meta_path = os.path.join(self.table_dir, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            # the on-disk bucket count always wins: files are already
            # named under it
            self.n_buckets = int(meta["n_buckets"])
            self.columns = meta.get("columns")
            self.fields = meta.get("fields")
        else:
            self.columns = None
            self.fields = None

    # -- ledger -----------------------------------------------------
    def _ledger_path(self) -> str:
        return os.path.join(self.table_dir, _LEDGER)

    def applied_batches(self) -> set[str]:
        if os.path.exists(self._ledger_path()):
            with open(self._ledger_path()) as fh:
                return set(fh.read().split())
        return set()

    def _append_ledger(self, batch_id: str) -> None:
        ids = self.applied_batches() | {batch_id}
        tmp = self._ledger_path() + ".partial"
        with open(tmp, "w") as fh:
            fh.write("\n".join(sorted(ids)) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._ledger_path())

    # -- recovery ---------------------------------------------------
    def recover(self) -> None:
        """Roll forward a marker-published commit that crashed
        mid-publish; roll back (delete) tmp garbage with no marker."""
        marker = os.path.join(self.table_dir, _MARKER)
        if os.path.exists(marker):
            with open(marker) as fh:
                plan = json.load(fh)
            for src_rel, dst_name in plan["moves"]:
                src = os.path.join(self.table_dir, src_rel)
                if os.path.exists(src):
                    os.replace(src,
                               os.path.join(self.table_dir, dst_name))
            if plan.get("ledger_batch") is not None:
                self._append_ledger(str(plan["ledger_batch"]))
            for name in plan["delete"]:
                p = os.path.join(self.table_dir, name)
                if os.path.exists(p):
                    os.remove(p)
            shutil.rmtree(os.path.join(self.table_dir, plan["tmp"]),
                          ignore_errors=True)
            os.remove(marker)
        for d in _glob.glob(os.path.join(self.table_dir, ".tmp-*")):
            shutil.rmtree(d, ignore_errors=True)

    # -- merge ------------------------------------------------------
    def merge(self, batch: DataFrame,
              merge_fn: Callable[[DataFrame | None, DataFrame], DataFrame],
              batch_id: int | str | None = None,
              ledgered: bool = False,
              fault=None) -> None:
        """Merge one micro-batch into the table.

        ``merge_fn(current, batch)`` receives the stored rows of the
        TOUCHED buckets only (None on first write) plus the batch rows,
        and returns their merged replacement — per-merge-key semantics
        (latest-per-key, additive re-agg, SCD2 re-window) are safe on
        a bucket slice because a key's rows all live in one bucket.

        ``ledgered=True`` adds the applied-batch-id exactly-once guard
        (non-idempotent merges, e.g. additive sums); idempotent merges
        skip it and rely on replay convergence.

        ``fault`` is the kill-point hook the recovery tests use; the
        four labels match the round-7 suite stage-for-stage:
        after_data_write (tmp written, nothing visible),
        after_live_aside (marker published — the commit point),
        after_tmp_in (new files moved in), after_ledger_write.
        """
        fault = fault or (lambda _stage: None)
        spark = batch.sparkSession
        self.recover()

        if ledgered:
            if batch_id is None:
                raise ValueError("ledgered merge needs a batch_id")
            if str(batch_id) in self.applied_batches():
                # replayed batch: skip the merge but still EXECUTE the
                # batch plan so a stateful upstream commits its state
                # version (same contract as the round-7 sinks)
                batch.write.format("noop").mode("overwrite").save()
                return

        bexpr = _bucket_of(self.keys, self.n_buckets)
        batch = batch.withColumn(_BCOL, bexpr).persist()
        try:
            touched = sorted(
                r[0] for r in
                batch.select(_BCOL).distinct().collect())
            if not touched:
                # empty batch: ledger it (a replay must still skip)
                # and stop — nothing to rewrite
                if ledgered:
                    self._append_ledger(str(batch_id))
                return

            legacy = _legacy_files(self.table_dir)
            out_cols = None
            full = bool(legacy)
            if not full and self.columns is not None:
                # schema evolution probe on the batch side: a new
                # column NAME, or a changed TYPE on a shared name
                # (parquet footers are type-strict), forces the
                # one-time full rewrite (docstring)
                if not set(batch.columns) - {_BCOL} <= set(self.columns):
                    full = True
                elif self.fields is not None:
                    full = any(
                        self.fields.get(f.name, f.dataType.simpleString())
                        != f.dataType.simpleString()
                        for f in batch.schema.fields if f.name != _BCOL)
            if full:
                touched = list(range(self.n_buckets))
                old_files = _data_files(self.table_dir)
            else:
                old_files = [f for b in touched
                             for f in _bucket_glob(self.table_dir, b)]

            cur = None
            if old_files:
                cur = spark.read.parquet(*old_files)
            merged = merge_fn(cur, batch.drop(_BCOL))
            out_cols = [c for c in merged.columns]
            out_fields = {f.name: f.dataType.simpleString()
                          for f in merged.schema.fields}
            merged = merged.withColumn(
                _BCOL, _bucket_of(self.keys, self.n_buckets))

            token = uuid.uuid4().hex[:12]
            tmp_rel = f".tmp-{token}"
            tmp = os.path.join(self.table_dir, tmp_rel)
            # one shuffle partition per touched bucket → one file per
            # bucket per merge; untouched buckets cost nothing
            (merged.repartition(max(len(touched), 1), F.col(_BCOL))
             .write.partitionBy(_BCOL).parquet(tmp))
            fault("after_data_write")

            moves: list[tuple[str, str]] = []
            for bdir in sorted(_glob.glob(os.path.join(tmp, f"{_BCOL}=*"))):
                b = int(os.path.basename(bdir).split("=", 1)[1])
                for i, f in enumerate(
                        sorted(_glob.glob(os.path.join(bdir, "*.parquet")))):
                    moves.append((
                        os.path.join(tmp_rel, os.path.basename(bdir),
                                     os.path.basename(f)),
                        f"b{b:05d}-{token}-{i}.parquet"))

            plan = {
                "tmp": tmp_rel,
                "moves": moves,
                "delete": [os.path.basename(f) for f in old_files],
                "ledger_batch": str(batch_id) if ledgered else None,
            }
            _atomic_write_json(os.path.join(self.table_dir, _MARKER), plan)
            fault("after_live_aside")  # commit point: roll-forward owns it

            for src_rel, dst_name in moves:
                os.replace(os.path.join(self.table_dir, src_rel),
                           os.path.join(self.table_dir, dst_name))
            fault("after_tmp_in")

            if ledgered:
                self._append_ledger(str(batch_id))
            fault("after_ledger_write")

            for name in plan["delete"]:
                p = os.path.join(self.table_dir, name)
                if os.path.exists(p):
                    os.remove(p)
            shutil.rmtree(tmp, ignore_errors=True)
            os.remove(os.path.join(self.table_dir, _MARKER))

            _atomic_write_json(
                os.path.join(self.table_dir, _META),
                {"n_buckets": self.n_buckets, "keys": self.keys,
                 "columns": out_cols, "fields": out_fields})
        finally:
            batch.unpersist()
