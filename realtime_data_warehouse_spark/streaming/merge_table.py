"""Hash-bucketed parquet MERGE tables — touched-bucket rewrites.

The round-8 merge sinks (streaming/sinks.py: upsert / dim-upsert /
additive / SCD2) were correct but O(table) per micro-batch: every
batch read + merged + rewrote the WHOLE stored table. That is the one
plan shape that cannot survive a 24/7 stream against a growing table —
at 100× the dim table a 5-second trigger rewrites the world every 5
seconds. The production fix is a transactional table format's keyed
``MERGE INTO`` (Delta/Iceberg rewrite only files whose key ranges
match), but the MECHANISM needs no Delta: hash-partition the stored
rows by merge key into buckets, and each batch rewrites ONLY the
buckets its keys fall in. Per-batch cost drops from O(table) to
O(batch + bucket_size · touched); a small CDC batch against a huge
table touches few buckets and the rest of the table is never read,
never written. Reference anchor: this is the scale story of the
reference's HBase dim sink (DimHBaseSinkFunction.java:16-105 — a Put
touches one rowkey region, not the table); the bucket is our region.

Adaptive bucket count (round 10 — the other half of the HBase
analogy, region SPLITTING): a fixed bucket count makes per-batch cost
grow ∝ table/n beyond the size it was tuned for (the round-9 flat
curve bends back at the next decade). So the count GROWS: when mean
bucket rows pass ``target_rows_per_bucket`` the table DOUBLES its
bucket count — a metadata-only commit, no data rewrite — and old
files migrate lazily. This works because the bucket function is
``pmod(xxhash64(keys), n)``: doubling n maps every key of old bucket
``b`` into exactly ``{b, b+n}`` (extendible hashing), so a file
written under an older generation ``g`` (every older generation
divides the current count, growth only doubles) still holds exactly
the keys of its child buckets ``{fid + j·g}``. Each file NAME carries
its generation; a merge that touches any child of an old-generation
file consumes that file whole and rewrites ALL its children under the
current generation (split-on-touch), so hot buckets migrate
immediately and cold ones pay nothing until touched. Steady-state
per-batch cost is O(batch + target_bucket_size · touched) at ANY
table size.

Layout — chosen so PLAIN ``spark.read.parquet(table_dir)`` keeps
working for every existing reader, with zero schema pollution:

    table_dir/
      b00007-n00032-<batchtoken>-0.parquet
                                      data files, FLAT; bucket id and
                                      bucket-count GENERATION encoded
                                      in the file NAME
      _table_meta.json                n_buckets, keys, columns/types,
                                      committed FILE MANIFEST +
                                      per-file row counts
      _applied_batches                batch-id ledger (additive sinks)
      _pending.json                   commit marker (exists only
                                      mid-commit; drives roll-forward)
      _archive/                       data files replaced by a commit,
                                      retained for `retain_versions`
                                      snapshots (then vacuumed)
      _meta_history/<version>.json    immutable manifest per commit —
                                      the time-travel index
      .tmp-<batchtoken>/              Spark output dir during a merge

Names starting with ``_`` / ``.`` are hidden from Spark's file index,
so the ledger, meta, marker and in-flight tmp dirs are invisible to
readers; the visible table is exactly the committed bucket files. The
bucket id is in the FILENAME (not a hive ``__b=`` dir) so readers see
the data schema unchanged.

Crash safety — commit-marker roll-forward (single writer, the
foreachBatch contract). A merge publishes in stages:

  1. write the merged touched buckets under ``.tmp-*`` (invisible);
  2. atomically publish ``_pending.json`` — the COMMIT POINT — listing
     every file move, every old file to retire, the batch id, AND the
     post-commit ``_table_meta.json`` contents;
  3. move the new bucket files in (os.replace, same filesystem);
  4. append the batch id to the ledger (ledger sinks);
  5. publish the new ``_table_meta.json`` plus its immutable copy
     under ``_meta_history/`` (the manifest flips to the new
     snapshot — see the reader note below);
  6. RETIRE the replaced old files into ``_archive/`` (moves, not
     deletes), drop tmp, remove the marker;
  7. vacuum: drop archived files and history manifests older than the
     last ``retain_versions`` snapshots (markerless GC — a crash here
     just leaves garbage for the next commit's vacuum).

A crash before (2) leaves only hidden garbage: recovery deletes orphan
tmp dirs and the batch replays in full. A crash anywhere after (2) is
rolled FORWARD by recovery — at the next merge, or at CONSTRUCTION
(round 10: the constructor recovers before reading meta, so a crash
on a table's FIRST merge can no longer lose the meta and silently
fall back to the constructor's bucket count / skip the schema-
evolution probe): every listed move whose source still exists is
completed (moves are idempotent — a missing source means that file
already moved), the ledger append is re-applied (append is a set
union), the meta from the plan is re-published, the retirements
re-run (missing = done), then the marker drops. So the ledger
invariant the round-7 kill suite pins — visible data from a batch
implies the ledger will contain that batch before the next merge
reads it — holds exactly as it did, and the same four kill points
fire at the analogous stages (see `merge`'s fault labels).

Concurrent readers — manifest snapshot reads + retention (round 10):
``_table_meta.json`` lists the committed data files ("files"), and it
is republished AFTER the new files move in but BEFORE the replaced
old files retire. A reader that loads via `read_table` therefore sees
a consistent snapshot even mid-crash-window: either the pre-batch
manifest or the post-batch manifest, and `_resolve_manifest_paths`
follows retired files into ``_archive/`` — so a SLOW reader holding
the previous manifest keeps a readable snapshot for a full retention
window (``retain_versions`` commits), not merely until the writer's
next cleanup pass. ``read_table(version=k)`` reads any retained
historical snapshot (time travel within the window);
``list_versions`` enumerates them. Directory-listing readers (plain
``spark.read.parquet``) keep the old weaker contract: atomic per
FILE, racing a commit window can see a bucket twice; the manifest
path is what a concurrent reader should use.

Multi-writer concurrency (round 11 — closing the last Delta-txn-log
gap): CONCURRENT writers (threads or processes) are arbitrated by
optimistic concurrency control, the same discipline as Delta's
commit protocol. A merge computes lock-free against the manifest
snapshot it loaded; the commit critical section — marker publish
through meta flip and retire — runs under an exclusive ``flock`` on
``_commit.lock`` and CASes on the manifest VERSION: if another
writer committed since the plan was computed, the commit aborts
unpublished and the loser re-reads the new manifest, re-merges its
batch against the updated buckets, and retries. flock rather than an
O_EXCL claim file because the kernel releases a flock when its
holder dies, whatever the death mode: the next locker finds the dead
writer's marker and completes its commit via the ordinary
roll-forward, under the same lock — no pid probing for staleness, no
remove-the-wrong-marker window. In-flight ``.tmp-<pid>-…`` dirs
carry their writer's pid so recovery sweeps only DEAD writers'
orphans. This is the multi-writer analogue of the reference's
concurrent HBase dim writers (DimHBaseSinkFunction.java:16-105,
where region-server row locks arbitrate racing Puts).

Schema discipline: a batch whose merged output adds column NAMES the
stored table lacks (dim bootstrap) forces a one-time FULL merge — all
buckets rewrite under the new schema, so bucket files stay mutually
consistent and plain readers never need mergeSchema. A batch whose
merged output is a SUBSET of the stored columns (a narrow CDC batch
whose keys all land in empty buckets — cur is None, so unionByName
can't re-widen it) is CONFORMED to the stored schema with typed null
columns before writing (round 10, closes the r9 ADVICE hole where a
narrow bucket file silently dropped the wide columns from every
plain read). Steady-state per-key traffic takes the touched-bucket
path.
"""

from __future__ import annotations

import contextlib
import fcntl
import glob as _glob
import json
import math
import os
import re
import shutil
import time
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_table_meta.json"
_LEDGER = "_applied_batches"
_MARKER = "_pending.json"
_ARCHIVE = "_archive"
_HISTORY = "_meta_history"
_LOCK = "_commit.lock"
_BCOL = "__b"

#: Bound on waiting for another writer's commit critical section (the
#: section holds the flock only for marker publish + file moves + meta
#: flip — never for the Spark merge job itself), and on the optimistic
#: retry loop as a whole. A healthy commit section is milliseconds;
#: ten minutes means a writer wedged mid-commit WITHOUT dying (death
#: releases the flock and the next locker rolls the marker forward).
LOCK_TIMEOUT_S = 600.0

#: Optimistic-concurrency retries: each conflict means another writer
#: committed between our manifest read and our commit claim, and we
#: re-merge against the new snapshot. 20 lost races in a row is not
#: contention, it is starvation — surface it.
MAX_COMMIT_RETRIES = 20

#: Snapshots (manifest + the data files it references) retained after
#: each commit — the current one plus this many minus one. 2 keeps
#: one historical version readable (time travel) and guarantees a
#: reader holding the PREVIOUS manifest a full commit cycle to finish
#: its scan; raise per table for deeper history, at linear disk cost
#: in churned buckets (Delta's retention/VACUUM trade, here with
#: auto-vacuum at commit).
DEFAULT_RETAIN_VERSIONS = 2

#: file name: b<bucket id, 5 digits>-n<generation = bucket count at
#: write time, 5 digits>-<batch token>-<i>.parquet. Round-9 files
#: lack the -n segment; they are read as generation = the table's
#: current bucket count (valid until the first growth, which renames
#: them — see _grow).
_GEN_RE = re.compile(r"^b(\d{5})-n(\d{5})-")
_UNTAGGED_RE = re.compile(r"^b(\d{5})-")

#: Default bucket count for tables created with no volume estimate.
#: Sized so a typical CDC micro-batch (tens to a few thousand distinct
#: keys) still leaves most buckets untouched; growth takes over from
#: there, so this is a floor, not a tuning knob.
DEFAULT_BUCKETS = 32

#: Growth target: mean rows per bucket above which the bucket count
#: doubles. At ~100–200 bytes/row this keeps bucket files in the
#: tens-of-MB range — healthy parquet, and a touched-bucket rewrite
#: stays a sub-second task. Per-table override via
#: ``target_rows_per_bucket`` (frozen into _table_meta.json).
DEFAULT_TARGET_ROWS_PER_BUCKET = 500_000

#: Growth ceiling — 64k buckets × the default target is ~3×10¹⁰ rows
#: per table before the curve would bend again; past that a real
#: deployment shards tables, not buckets.
MAX_BUCKETS = 65_536


def buckets_for_rows(expected_rows: int,
                     target: int = DEFAULT_TARGET_ROWS_PER_BUCKET) -> int:
    """Initial bucket count for an expected table volume: the smallest
    power of two whose mean bucket load is under `target` (pow2 keeps
    every generation dividing every later one under doubling growth),
    clamped to [DEFAULT_BUCKETS, MAX_BUCKETS]. Same derive-don't-
    hardcode pattern as runner.shuffle_for_volume and
    session.auto_state_store."""
    need = max(1, math.ceil(max(0, expected_rows) / target))
    n = 1 << max(0, (need - 1).bit_length())
    return max(DEFAULT_BUCKETS, min(MAX_BUCKETS, n))


def _bucket_of(keys: Sequence[str], n: int):
    # xxhash64 is seed-fixed and stable across sessions/versions we
    # target, so file→bucket assignment survives restarts.
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                  F.lit(n)).cast("int")


def _data_files(table_dir: str) -> list[str]:
    return sorted(
        p for p in _glob.glob(os.path.join(table_dir, "*"))
        if os.path.isfile(p)
        and not os.path.basename(p).startswith(("_", "."))
    )


def _legacy_files(table_dir: str) -> list[str]:
    """Visible data files NOT written by this engine (an old
    whole-table layout being upgraded in place)."""
    return [p for p in _data_files(table_dir)
            if not _UNTAGGED_RE.match(os.path.basename(p))]


def _parse_name(name: str, default_gen: int) -> tuple[int, int] | None:
    """(bucket id, generation) from an engine file name; untagged
    round-9 names read as the table's current generation. None for
    non-engine files."""
    m = _GEN_RE.match(name)
    if m:
        return int(m.group(1)), int(m.group(2))
    m = _UNTAGGED_RE.match(name)
    if m:
        return int(m.group(1)), default_gen
    return None


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".partial"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def _file_rows(path: str) -> int:
    """Row count from the parquet footer only — no scan, no Spark
    job; this is what keeps the growth check O(touched) per batch."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    return pq.ParquetFile(path).metadata.num_rows


def _stat_jsonable(v):
    """Footer min/max → manifest-storable scalar. Timestamps/dates go
    to ISO strings (lexicographic order == chronological order, so
    range pruning keeps working); bytes are not indexable."""
    import datetime  # noqa: PLC0415

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (int, float, str, bool)):
        return v
    return None


def _file_footer(path: str, stats_cols) -> tuple[int, dict]:
    """(row count, {col: [min, max]}) from ONE footer open — the
    commit-time stats gather for manifest data skipping (round 11).
    A column gets stats only if EVERY row group carries min/max
    (else the envelope would silently under-cover and pruning would
    drop matching rows)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    md = pq.ParquetFile(path).metadata
    stats: dict[str, list] = {}
    if stats_cols:
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in stats_cols:
            if c not in idx:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    mins = []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                lo = _stat_jsonable(min(mins))
                hi = _stat_jsonable(max(maxs))
                if lo is not None and hi is not None:
                    stats[c] = [lo, hi]
    return md.num_rows, stats


def _tmp_owner_alive(tmp_name: str) -> bool:
    """True iff an in-flight ``.tmp-<pid>-<token>`` dir belongs to a
    LIVE process — recovery must not delete another writer's
    in-progress output (round 11). Legacy ``.tmp-<token>`` names (no
    pid segment) read as dead: they predate multi-writer and are
    always orphans by the old single-writer contract.

    SINGLE-HOST assumption (r12 ADVICE): the pid probe is only
    meaningful for writers on this host — the whole commit protocol
    (flock) already assumes one host per table dir. A recycled pid
    (or PermissionError) reads as alive, so the sweep in
    _recover_locked adds an age fallback: a .tmp dir untouched for
    2x LOCK_TIMEOUT_S is removed regardless — no live writer holds
    an in-flight dir longer than a lock timeout."""
    parts = tmp_name.split("-")
    if len(parts) < 3 or not parts[1].isdigit():
        return False
    try:
        os.kill(int(parts[1]), 0)
        return True
    except PermissionError:
        return True  # exists, owned by someone else
    except (ProcessLookupError, OSError):
        return False


def _resolve_manifest_paths(table_dir: str, files) -> list[str]:
    """Manifest file names → readable paths: the live name if present,
    else the archived copy (a later commit replaced the file but
    retention still holds it). Raises if a file was vacuumed."""
    out = []
    for f in files:
        live = os.path.join(table_dir, f)
        if os.path.exists(live):
            out.append(live)
            continue
        arch = os.path.join(table_dir, _ARCHIVE, f)
        if os.path.exists(arch):
            out.append(arch)
            continue
        raise FileNotFoundError(
            f"{f} referenced by this manifest was vacuumed — raise "
            f"retain_versions to keep older snapshots readable")
    return out


def list_versions(table_dir: str) -> list[int]:
    """Committed versions still readable via read_table(version=...)."""
    hdir = os.path.join(table_dir.rstrip("/"), _HISTORY)
    if not os.path.isdir(hdir):
        return []
    return sorted(int(f[:-5]) for f in os.listdir(hdir)
                  if f.endswith(".json"))


def read_table(spark: SparkSession, table_dir: str,
               version: int | None = None) -> DataFrame:
    """Snapshot read of a merge table via its manifest: load exactly
    the files ``_table_meta.json`` names, so a reader racing a
    writer's crash window sees one committed snapshot — never a
    bucket twice, never a half-published batch (module docstring,
    "Concurrent readers"). Falls back to a plain directory read for
    dirs without a manifest (streaming append sinks, foreign
    parquet).

    ``version=k`` reads a RETAINED historical snapshot (round 10,
    Delta-gap: time travel within the retention window): each commit
    archives the manifest it replaces and moves replaced data files
    to ``_archive/`` instead of deleting, keeping the snapshots of
    the last ``retain_versions`` commits fully readable; auto-vacuum
    at commit drops anything older. This also closes the slow-reader
    race a plain delete would have: a reader holding the previous
    manifest can finish its scan — the files it references stay on
    disk for a full retention window, not just until the writer's
    next delete pass."""
    table_dir = table_dir.rstrip("/")
    if version is not None:
        hpath = os.path.join(table_dir, _HISTORY, f"{version:08d}.json")
        if not os.path.exists(hpath):
            raise ValueError(
                f"version {version} not retained; readable versions: "
                f"{list_versions(table_dir)}")
        with open(hpath) as fh:
            meta = json.load(fh)
        return spark.read.parquet(
            *_resolve_manifest_paths(table_dir, meta.get("files") or []))
    meta_path = os.path.join(table_dir, _META)
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        files = meta.get("files")
        if files:
            return spark.read.parquet(
                *_resolve_manifest_paths(table_dir, files))
    return spark.read.parquet(table_dir)


def stats_pruned_files(table_dir: str, col: str, lo=None,
                       hi=None) -> tuple[list[str], int]:
    """(files whose [min,max] envelope for ``col`` intersects
    [lo, hi], total manifest files) — the manifest-stats data-skipping
    evaluation for NON-key predicates on a bucketed merge table
    (round 11 stretch; key predicates use point_lookup's exact hash
    prune instead). Stats live IN the manifest (committed
    transactionally with the files — never stale, unlike a sidecar
    index), gathered from the same footer open that counts rows at
    commit. Files without stats for the column are conservatively
    kept, so pruning is an upper bound, exactly like an Iceberg
    manifest evaluation.

    Why this matters on a MERGE table: bucket files mix each key's
    whole history, so a value-correlated column (e.g. ts) spans
    widely — but CDC touches a SUBSET of buckets per window, so cold
    buckets' max(ts) ages out and a recent-ts scan skips them. The
    skip rate is the fraction of buckets untouched since ``lo``.

    Bound types: timestamp/date stats are stored as ISO strings
    (_stat_jsonable — lexicographic == chronological), so datetime
    bounds are normalized through the same function here (r12 ADVICE
    fix: a datetime bound used to TypeError against the stored
    strings); callers may equivalently pass ISO strings directly."""
    lo = _stat_jsonable(lo) if lo is not None else None
    hi = _stat_jsonable(hi) if hi is not None else None
    meta_path = os.path.join(table_dir.rstrip("/"), _META)
    if not os.path.exists(meta_path):
        raise ValueError(f"{table_dir} is not a merge table (no {_META})")
    with open(meta_path) as fh:
        meta = json.load(fh)
    files = meta.get("files") or []
    fstats = meta.get("file_stats") or {}
    keep = []
    for f in files:
        env = (fstats.get(f) or {}).get(col)
        if env is None:
            keep.append(f)  # no stats: conservatively kept
            continue
        fmin, fmax = env
        if lo is not None and fmax < lo:
            continue
        if hi is not None and fmin > hi:
            continue
        keep.append(f)
    return keep, len(files)


def read_pruned(spark: SparkSession, table_dir: str, col: str,
                lo=None, hi=None) -> DataFrame:
    """Manifest-stats-pruned range read: open only the files
    stats_pruned_files keeps, then apply the residual row filter
    (the envelope is an upper bound, as with any manifest prune)."""
    keep, _total = stats_pruned_files(table_dir, col, lo, hi)
    pred = None
    if lo is not None:
        pred = F.col(col) >= F.lit(lo)
    if hi is not None:
        c = F.col(col) <= F.lit(hi)
        pred = c if pred is None else (pred & c)
    if not keep:
        base = read_table(spark, table_dir).limit(0)
        return base.filter(pred) if pred is not None else base
    df = spark.read.parquet(
        *_resolve_manifest_paths(table_dir.rstrip("/"), keep))
    return df.filter(pred) if pred is not None else df


def point_lookup(spark: SparkSession, table_dir: str,
                 values) -> DataFrame:
    """Key-pruned read of a merge table (round-10 stretch: read-side
    pruning for the bucketed layout): hash the requested key values
    with the engine's own bucket function, open ONLY the files whose
    (bucket id, generation) serve those buckets — for hash-bucketed
    data this prune is EXACT per bucket (a key's rows live in exactly
    one bucket per generation), strictly stronger than a min/max
    manifest on hash-distributed keys (whose per-file envelopes span
    the whole domain and prune nothing). Residual equality filter
    still applies row-by-row, as with any manifest prune. Read
    amplification is files(touched buckets)/files(table) ≈
    |keys|/n_buckets for point traffic — the read-side twin of the
    merge path's touched-bucket write discipline, and the literal
    HBase-Get analogue of the dim sink's rowkey→region addressing
    (DimHBaseSinkFunction.java:16-105).

    `values`: one key value (single-key tables), or a list of values
    / tuples (composite keys) — model-parameter-sized driver data,
    like any point-Get key set."""
    meta_path = os.path.join(table_dir.rstrip("/"), _META)
    if not os.path.exists(meta_path):
        raise ValueError(f"{table_dir} is not a merge table (no {_META})")
    with open(meta_path) as fh:
        meta = json.load(fh)
    keys, n = list(meta["keys"]), int(meta["n_buckets"])
    if not isinstance(values, (list, tuple)) or (
            len(keys) > 1 and values and not isinstance(values[0], tuple)):
        values = [values]
    if isinstance(values, (list, tuple)) and len(values) == 0:
        # an empty key set would leave pred=None and .filter(None)
        # would raise an opaque TypeError downstream (r10 ADVICE)
        raise ValueError("point_lookup: no lookup values given")
    rows = [v if isinstance(v, tuple) else (v,) for v in values]
    lit = spark.createDataFrame(rows, keys) if len(keys) > 1 else \
        spark.createDataFrame([(r[0],) for r in rows], [keys[0]])
    # xxhash64 is TYPE-sensitive: hash the literals under the STORED
    # key types (meta['fields']), not whatever createDataFrame infers
    # from the Python values (int → long), or an IntegerType/DateType
    # key column would bucket differently at write time and the
    # lookup would silently miss (r10 ADVICE)
    fields = meta.get("fields") or {}
    lit = lit.select(*[
        F.col(k).cast(fields[k]).alias(k) if k in fields else F.col(k)
        for k in keys])
    wanted = {
        r[0] for r in lit.select(
            _bucket_of(keys, n).alias("b")).distinct().collect()
    }
    manifest = meta.get("files")
    files = []
    for f in manifest or []:
        parsed = _parse_name(f, n)
        if parsed is None:
            continue
        fid, gen = parsed
        # a file of generation g serves current bucket b iff fid == b % g
        if any(fid == b % gen for b in wanted):
            files.append(f)
    pred = None
    for r in rows:
        eq = None
        for k, v in zip(keys, r):
            c = F.col(k) == F.lit(v)
            eq = c if eq is None else (eq & c)
        pred = eq if pred is None else (pred | eq)
    if manifest is None:
        # meta predates the file manifest (a round-9 table before its
        # first round-10 merge): no prune possible, but matching rows
        # DO exist on disk — fall back to the directory read instead
        # of conflating "no manifest" with "no serving files"
        # (r10 ADVICE)
        return read_table(spark, table_dir).filter(pred)
    if not files:
        return read_table(spark, table_dir).filter(pred).limit(0)
    df = spark.read.parquet(
        *[os.path.join(table_dir, f) for f in files])
    return df.filter(pred)


class BucketedMergeTable:
    """One merge-maintained parquet table. Construct per foreachBatch
    call (stateless — all state is on disk), then ``merge`` the batch.

    ``n_buckets`` / ``expected_rows`` / ``target_rows_per_bucket``
    apply only at table CREATION; afterwards the on-disk meta wins
    (files are already named under it). With ``expected_rows`` the
    initial count is derived (buckets_for_rows); either way the count
    then grows by doubling as the table does (module docstring).
    """

    def __init__(self, table_dir: str, keys: Sequence[str],
                 n_buckets: int | None = None,
                 expected_rows: int | None = None,
                 target_rows_per_bucket: int | None = None,
                 retain_versions: int | None = None,
                 stats_cols: Sequence[str] | None = None):
        self.table_dir = table_dir.rstrip("/")
        self.keys = list(keys)
        os.makedirs(self.table_dir, exist_ok=True)
        # roll forward BEFORE reading meta: a crash after the commit
        # point of this table's FIRST merge leaves committed files
        # whose meta exists only in the marker plan — reading disk
        # meta first would silently revert to constructor defaults.
        self.columns = None
        self.fields = None
        self.file_rows: dict[str, int] = {}
        self.file_stats: dict[str, dict] = {}
        self.stats_cols: list[str] = list(stats_cols or [])
        self.version = 0
        self.n_buckets = 0  # recover() may need _append_ledger only
        self.recover()
        meta_path = os.path.join(self.table_dir, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            # the on-disk bucket count always wins: files are already
            # named under it
            self.n_buckets = int(meta["n_buckets"])
            self.columns = meta.get("columns")
            self.fields = meta.get("fields")
            self.file_rows = dict(meta.get("file_rows") or {})
            self.version = int(meta.get("version") or 0)
            self.target_rows = int(
                meta.get("target_rows_per_bucket")
                or target_rows_per_bucket
                or DEFAULT_TARGET_ROWS_PER_BUCKET)
            self.retain = int(
                meta.get("retain_versions")
                or retain_versions
                or DEFAULT_RETAIN_VERSIONS)
        else:
            if n_buckets is not None:
                self.n_buckets = int(n_buckets)
            elif expected_rows is not None:
                self.n_buckets = buckets_for_rows(
                    expected_rows,
                    target_rows_per_bucket
                    or DEFAULT_TARGET_ROWS_PER_BUCKET)
            else:
                self.n_buckets = DEFAULT_BUCKETS
            self.target_rows = int(target_rows_per_bucket
                                   or DEFAULT_TARGET_ROWS_PER_BUCKET)
            self.retain = int(retain_versions or DEFAULT_RETAIN_VERSIONS)

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

    # -- meta -------------------------------------------------------
    def _meta_dict(self, files_rows: dict[str, int],
                   files_stats: dict[str, dict] | None = None) -> dict:
        if files_stats is None:
            # metadata-only commits (growth): every name survives a
            # rename with its stats; retired/renamed names drop out
            files_stats = {name: self.file_stats[name]
                           for name in files_rows
                           if name in self.file_stats}
        return {
            "version": self.version + 1,
            "n_buckets": self.n_buckets,
            "keys": self.keys,
            "columns": self.columns,
            "fields": self.fields,
            "target_rows_per_bucket": self.target_rows,
            "retain_versions": self.retain,
            "stats_cols": self.stats_cols,
            "files": sorted(files_rows),
            "file_rows": files_rows,
            "file_stats": files_stats,
        }

    def _load_meta(self, meta: dict) -> None:
        self.n_buckets = int(meta["n_buckets"])
        self.columns = meta.get("columns")
        self.fields = meta.get("fields")
        self.file_rows = dict(meta.get("file_rows") or {})
        self.file_stats = dict(meta.get("file_stats") or {})
        self.version = int(meta.get("version") or 0)
        if meta.get("stats_cols"):
            self.stats_cols = list(meta["stats_cols"])
        if meta.get("target_rows_per_bucket"):
            self.target_rows = int(meta["target_rows_per_bucket"])
        if meta.get("retain_versions"):
            self.retain = int(meta["retain_versions"])

    # -- recovery ---------------------------------------------------
    def _write_meta(self, meta: dict) -> None:
        """Publish a committed manifest: the live ``_table_meta.json``
        plus its immutable copy under ``_meta_history/`` (the time-
        travel index). Idempotent — roll-forward re-runs it."""
        _atomic_write_json(os.path.join(self.table_dir, _META), meta)
        hdir = os.path.join(self.table_dir, _HISTORY)
        os.makedirs(hdir, exist_ok=True)
        _atomic_write_json(
            os.path.join(hdir, f"{int(meta['version']):08d}.json"), meta)
        self._load_meta(meta)

    def _link_archive(self, pairs) -> None:
        """Hardlink a LIVE file into ``_archive/`` under another name
        (``[live_name, archived_name]`` pairs). Used by growth's
        legacy-rename commit: the rename is really retire+add — a
        retained historical manifest (or a slow reader holding the
        pre-growth manifest) still references the UNTAGGED name, so a
        copy of that name must stay resolvable in the archive for the
        retention window (r10 ADVICE). Idempotent; copy fallback for
        filesystems without hardlinks."""
        if not pairs:
            return
        adir = os.path.join(self.table_dir, _ARCHIVE)
        os.makedirs(adir, exist_ok=True)
        for live_name, arch_name in pairs:
            src = os.path.join(self.table_dir, live_name)
            dst = os.path.join(adir, arch_name)
            if os.path.exists(dst) or not os.path.exists(src):
                continue
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)

    def _retire(self, names) -> None:
        """Move replaced data files to ``_archive/`` instead of
        deleting: readers holding an older manifest (or asking for an
        older version) can still resolve them for a full retention
        window. Idempotent — a missing source already moved."""
        adir = os.path.join(self.table_dir, _ARCHIVE)
        os.makedirs(adir, exist_ok=True)
        for name in names:
            p = os.path.join(self.table_dir, name)
            if os.path.exists(p):
                os.replace(p, os.path.join(adir, name))

    def _vacuum(self) -> None:
        """Drop snapshots beyond the retention window: keep the last
        ``retain_versions`` manifests and every archived file one of
        them references; remove the rest. Pure garbage collection of
        unreferenced files — crash-safe with no marker (a crash
        mid-vacuum leaves extra garbage, re-collected next commit)."""
        hdir = os.path.join(self.table_dir, _HISTORY)
        if not os.path.isdir(hdir):
            return
        versions = sorted(
            int(f[:-5]) for f in os.listdir(hdir) if f.endswith(".json"))
        keep, drop = versions[-self.retain:], versions[:-self.retain]
        referenced: set[str] = set()
        for v in keep:
            with open(os.path.join(hdir, f"{v:08d}.json")) as fh:
                referenced |= set(json.load(fh).get("files") or [])
        adir = os.path.join(self.table_dir, _ARCHIVE)
        if os.path.isdir(adir):
            for f in os.listdir(adir):
                if f not in referenced:
                    os.remove(os.path.join(adir, f))
        for v in drop:
            os.remove(os.path.join(hdir, f"{v:08d}.json"))

    # -- commit mutex (round 11: multi-writer arbitration) -----------
    @contextlib.contextmanager
    def _commit_lock(self):
        """Exclusive flock over the table's commit critical section.
        Held only around marker publish + the publish stages — never
        around the Spark merge job, so writers overlap on the
        expensive work and serialize only the (milliseconds-long)
        commit. flock is the right mutex here because the kernel
        releases it when the holder DIES, whatever the death mode —
        the next locker finds the crashed writer's marker and rolls
        it forward under the same lock, so stale-holder takeover
        needs no pid probing and has no remove-the-wrong-marker race.
        A fresh fd per acquisition makes the lock exclusive between
        THREADS of one process too (flock is per open-file-
        description). Bounded wait: a holder alive but wedged past
        LOCK_TIMEOUT_S raises instead of deadlocking the stream."""
        fd = os.open(os.path.join(self.table_dir, _LOCK),
                     os.O_CREAT | os.O_RDWR, 0o644)
        try:
            deadline = time.monotonic() + LOCK_TIMEOUT_S
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except BlockingIOError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"commit lock on {self.table_dir} held for "
                            f">{LOCK_TIMEOUT_S}s — writer alive but "
                            f"wedged mid-commit") from None
                    time.sleep(0.005)
            yield
        finally:
            os.close(fd)  # closing the fd releases the flock

    def _disk_version(self) -> int:
        meta_path = os.path.join(self.table_dir, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                return int(json.load(fh).get("version") or 0)
        return 0

    def _reload_from_disk(self) -> None:
        """Refresh in-memory table state from the committed manifest —
        the loser's first step after a commit conflict."""
        meta_path = os.path.join(self.table_dir, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                self._load_meta(json.load(fh))

    def recover(self) -> None:
        """Roll forward a marker-published commit that crashed
        mid-publish; roll back (delete) orphaned tmp garbage. Takes
        the commit lock: a marker can only be OBSERVED outside the
        lock if its writer died holding it (commits run their full
        publish under the lock), so by the time we hold the lock the
        marker is either gone (the writer finished) or ours to roll
        forward — there is no live-writer takeover race."""
        with self._commit_lock():
            self._recover_locked()

    def _recover_locked(self) -> None:
        """Roll-forward body — caller MUST hold the commit lock.
        Stage order mirrors _commit's publish: moves, ledger, META,
        retire — meta lands before the replaced files leave the live
        dir, so manifest readers keep a consistent snapshot through
        the roll-forward too. Orphan tmp dirs are removed only when
        their owner pid is dead (the pid is in the dir name):
        another LIVE writer's in-flight .tmp-* is its own business."""
        marker = os.path.join(self.table_dir, _MARKER)
        if os.path.exists(marker):
            with open(marker) as fh:
                plan = json.load(fh)
            for src_rel, dst_name in plan["moves"]:
                src = os.path.join(self.table_dir, src_rel)
                if os.path.exists(src):
                    os.replace(src,
                               os.path.join(self.table_dir, dst_name))
            self._link_archive(plan.get("archive_links", []))
            if plan.get("ledger_batch") is not None:
                self._append_ledger(str(plan["ledger_batch"]))
            if plan.get("meta") is not None:
                self._write_meta(plan["meta"])
            self._retire(plan.get("retire", plan.get("delete", [])))
            if plan.get("tmp"):
                shutil.rmtree(os.path.join(self.table_dir, plan["tmp"]),
                              ignore_errors=True)
            os.remove(marker)
        for d in _glob.glob(os.path.join(self.table_dir, ".tmp-*")):
            if _tmp_owner_alive(os.path.basename(d)):
                # age fallback (r12 ADVICE fix): a recycled pid makes
                # a dead writer's dir read as alive forever — an
                # unbounded disk leak. No live writer keeps an
                # in-flight tmp dir past a lock timeout, so anything
                # older than 2x LOCK_TIMEOUT_S is an orphan.
                try:
                    age = time.time() - os.path.getmtime(d)
                except OSError:
                    continue  # vanished concurrently
                if age <= 2 * LOCK_TIMEOUT_S:
                    continue
            shutil.rmtree(d, ignore_errors=True)

    # -- commit (shared by merge and grow) --------------------------
    def _commit(self, plan: dict, fault,
                expected_version: int | None = None) -> bool:
        """Publish a marker plan: lock → roll forward any crashed
        commit → version CAS → marker (COMMIT POINT) → moves →
        ledger → meta (+history copy) → retire replaced files to the
        archive → tmp cleanup → marker gone → vacuum past the
        retention window → unlock. Identical stage order to
        _recover_locked's roll-forward (vacuum excepted — it is
        markerless GC).

        ``expected_version`` is the optimistic-concurrency CAS
        (round 11, the Delta-txn-log gap): the plan was computed
        against that manifest version; if another writer committed
        in between, the plan's consumed files are stale — return
        False WITHOUT publishing, and the caller re-merges against
        the new snapshot and retries. A kill anywhere after the
        marker lands is rolled forward by the next locker (the flock
        died with the writer), so the crash contract is unchanged."""
        with self._commit_lock():
            self._recover_locked()
            if (expected_version is not None
                    and self._disk_version() != expected_version):
                return False
            _atomic_write_json(os.path.join(self.table_dir, _MARKER), plan)
            fault("after_live_aside")  # commit point: roll-forward owns it

            for src_rel, dst_name in plan["moves"]:
                os.replace(os.path.join(self.table_dir, src_rel),
                           os.path.join(self.table_dir, dst_name))
            fault("after_tmp_in")

            self._link_archive(plan.get("archive_links", []))
            if plan.get("ledger_batch") is not None:
                self._append_ledger(str(plan["ledger_batch"]))
            fault("after_ledger_write")

            if plan.get("meta") is not None:
                self._write_meta(plan["meta"])
            self._retire(plan.get("retire", []))
            if plan.get("tmp"):
                shutil.rmtree(os.path.join(self.table_dir, plan["tmp"]),
                              ignore_errors=True)
            os.remove(os.path.join(self.table_dir, _MARKER))
            self._vacuum()
        return True

    # -- bucket/file resolution --------------------------------------
    def _resolve(self, touched: list[int]) -> tuple[list[str], list[int]]:
        """Files to consume and the CLOSED set of buckets to rewrite
        for a batch touching `touched` (current-generation ids).

        An old-generation file (gen g < n_buckets) holds the keys of
        ALL its child buckets {fid + j·g}; consuming it for one child
        forces rewriting every child (split-on-touch), and those
        children may in turn map into other old-generation files —
        hence the worklist closure. Generations divide the current
        count by construction (growth only doubles); a foreign
        generation is corruption and raises.

        File enumeration is MANIFEST-based when a manifest exists
        (round 11, multi-writer): a directory listing can catch a
        concurrent committer between its moves-in and its retires and
        see a bucket's old AND new file simultaneously — consuming
        both would double the bucket's rows. The manifest is one
        atomic JSON, always a consistent snapshot; if it goes stale
        under our feet the commit CAS fails and the merge re-runs
        against the new one. Directory fallback only for manifest-
        less tables (first merge / round-9 upgrade), which are
        single-writer by construction."""
        names = sorted(self.file_rows) if self.file_rows else [
            os.path.basename(p) for p in _data_files(self.table_dir)]
        entries = []
        for name in names:
            p = os.path.join(self.table_dir, name)
            parsed = _parse_name(name, self.n_buckets)
            if parsed is None:
                continue  # legacy files handled by the full-rewrite path
            fid, gen = parsed
            if self.n_buckets % gen != 0:
                raise ValueError(
                    f"bucket file {os.path.basename(p)} has generation "
                    f"{gen} which does not divide current bucket count "
                    f"{self.n_buckets}")
            entries.append((p, fid, gen))

        selected: set[str] = set()
        closed: set[int] = set()
        work = list(dict.fromkeys(touched))
        while work:
            b = work.pop()
            if b in closed:
                continue
            closed.add(b)
            for p, fid, gen in entries:
                if p in selected:
                    continue
                if fid == b % gen:
                    selected.add(p)
                    if gen < self.n_buckets:
                        for child in range(fid, self.n_buckets, gen):
                            if child not in closed:
                                work.append(child)
        return sorted(selected), sorted(closed)

    def _bucket_row_estimates(self) -> list[float]:
        """Per-current-bucket row estimates from the manifest's
        per-file counts — no scan. A current-generation file maps 1:1
        to its bucket; an old-generation file's rows are attributed
        evenly across its child buckets (the within-file split is
        unknown until split-on-touch reads it — even attribution is
        the max-entropy estimate and errs toward triggering late, not
        spuriously)."""
        est = [0.0] * self.n_buckets
        for name, rows in self.file_rows.items():
            parsed = _parse_name(name, self.n_buckets)
            if parsed is None:
                continue
            fid, gen = parsed
            children = max(1, self.n_buckets // gen)
            share = rows / children
            for child in range(fid, self.n_buckets, gen):
                est[child] += share
        return est

    # -- growth -----------------------------------------------------
    def _maybe_grow(self, fault) -> None:
        """Double the bucket count when the MEAN bucket rows pass the
        target, or (round 11, the skew trigger) when the LARGEST
        bucket passes 2× target while the mean sleeps — a METADATA-
        ONLY commit (no data rewrite): untagged round-9 files get
        their generation stamped into the name (pure renames under
        the marker), tagged files keep working because their
        generation divides the doubled count; actual data migration
        is lazy, split-on-touch in later merges. The HBase-region-
        split half of the dim-sink analogy
        (DimHBaseSinkFunction.java:16-105 — HBase likewise splits on
        the largest REGION, not the mean).

        Why the skew trigger matters: hash-uniform single-row-per-key
        tables keep max ≈ mean, but a MULTI-row-per-key table (SCD2
        history, event journals) under Zipf keys hot-spots one bucket
        long before the mean moves, and that bucket's rewrite cost is
        what a batch touching it pays. Doubling splits the hot
        bucket's OTHER keys away from it. What doubling cannot split
        is a single hot KEY — so skew-driven growth is capped at
        4× the mean-derived bucket count (pow2 of 4·total/target):
        past that, the hot bucket is (mostly) one key, more buckets
        cannot shrink it, and the honest cost statement is
        O(batch + hot-key rows) for batches touching that key. Skew
        growth doubles ONE step per commit (each split halves the
        estimate's blur, so re-measure before doubling again); mean
        growth keeps its multi-doubling catch-up."""
        total = sum(self.file_rows.values())
        if not total or self.n_buckets >= MAX_BUCKETS:
            return
        new_n = self.n_buckets
        while new_n < MAX_BUCKETS and total / new_n > self.target_rows:
            new_n *= 2
        if new_n == self.n_buckets:
            # mean is healthy — check the largest bucket (skew)
            need = math.ceil(total / self.target_rows)
            skew_cap = 1 << max(0, (4 * need - 1).bit_length())
            if (self.n_buckets * 2 <= min(MAX_BUCKETS, skew_cap)
                    and max(self._bucket_row_estimates())
                    > 2 * self.target_rows):
                new_n = self.n_buckets * 2
        if new_n == self.n_buckets:
            return

        moves: list[tuple[str, str]] = []
        links: list[tuple[str, str]] = []
        new_rows: dict[str, int] = {}
        names = sorted(self.file_rows) if self.file_rows else [
            os.path.basename(p) for p in _data_files(self.table_dir)]
        for name in names:
            p = os.path.join(self.table_dir, name)
            parsed = _parse_name(name, self.n_buckets)
            if parsed is None:
                continue
            fid, gen = parsed
            if _GEN_RE.match(name):
                new_rows[name] = self.file_rows.get(name, _file_rows(p))
            else:
                tagged = f"b{fid:05d}-n{gen:05d}-" + name[len(f"b{fid:05d}-"):]
                moves.append((name, tagged))
                # the rename is retire+add for manifest purposes: a
                # retained historical manifest (and any slow reader
                # holding it) references the UNTAGGED name, so leave a
                # hardlink of it in _archive/ until vacuum ages it out
                # (r10 ADVICE — keeps read_table(version=k) working
                # across a legacy upgrade)
                links.append((tagged, name))
                new_rows[tagged] = self.file_rows.get(name, _file_rows(p))

        old_n = self.n_buckets
        self.n_buckets = new_n
        plan = {
            "tmp": None,
            "moves": moves,
            "archive_links": links,
            "retire": [],
            "ledger_batch": None,
            "meta": self._meta_dict(new_rows),
        }
        try:
            committed = self._commit(plan, fault,
                                     expected_version=self.version)
        except BaseException:
            self.n_buckets = old_n  # commit may not have landed
            raise
        if not committed:
            # another writer committed between our merge and this
            # growth check — drop it; the next merge re-evaluates
            # against the fresher (and larger) manifest
            self.n_buckets = old_n
            self._reload_from_disk()

    # -- compaction (round 11) ---------------------------------------
    def compact(self, spark: SparkSession, fault=None) -> int:
        """Bucket-aware compaction for GROWN tables: rewrite every
        current bucket still served by an old-generation file — or by
        more than one file — into exactly one current-generation
        file, in one pass, under the same marker/CAS commit and
        retention as any merge (replaced fragments retire to
        ``_archive/``; time travel keeps working).

        Why: a growth event is metadata-only, so a five-doubling
        table still carries files at generations 32…512 under 1024
        buckets. Each such file SERVES n/gen buckets — a point
        lookup for one key reads the whole multi-bucket file
        (read amplification n/gen), and the first merge touching any
        child consumes the file whole and rewrites ALL its children
        (split-on-touch write amplification, paid at merge latency).
        Compaction pre-pays those splits at maintenance time — the
        scheduled OPTIMIZE every lakehouse runs, teaching the
        round-8 ``optimize_table`` verb the bucketed layout
        (operators/maintenance.py delegates here when the dir is a
        merge table, since a round-robin rewrite would destroy the
        bucket-in-filename addressing).

        No coalescing is needed in the other direction: growth fires
        only when mean bucket rows pass ``target_rows_per_bucket``,
        so post-compaction per-bucket files sit near the target
        (tens of MB at warehouse row widths) — healthy parquet.

        Returns the number of buckets rewritten (0 = nothing
        fragmented; the call is then free — no Spark job runs).
        Safe under concurrent writers: lost CAS races reload and
        retry like any merge."""
        fault = fault or (lambda _stage: None)
        self.recover()
        self._reload_from_disk()
        for _attempt in range(MAX_COMMIT_RETRIES):
            names = sorted(self.file_rows) if self.file_rows else [
                os.path.basename(p) for p in _data_files(self.table_dir)]
            serving: dict[int, int] = {}
            frag: set[int] = set()
            for name in names:
                parsed = _parse_name(name, self.n_buckets)
                if parsed is None:
                    continue
                fid, gen = parsed
                for child in range(fid, self.n_buckets, gen):
                    serving[child] = serving.get(child, 0) + 1
                    if gen < self.n_buckets:
                        frag.add(child)
            frag |= {b for b, cnt in serving.items() if cnt > 1}
            if not frag:
                return 0
            old_files, write_buckets = self._resolve(sorted(frag))
            if not old_files:
                return 0

            token = uuid.uuid4().hex[:12]
            tmp_rel = f".tmp-{os.getpid()}-{token}"
            tmp = os.path.join(self.table_dir, tmp_rel)
            try:
                cur = spark.read.parquet(*old_files)
                merged = cur.withColumn(
                    _BCOL, _bucket_of(self.keys, self.n_buckets))
                (merged.repartition(max(len(write_buckets), 1),
                                    F.col(_BCOL))
                 .write.partitionBy(_BCOL).parquet(tmp))
            except Exception as exc:  # noqa: BLE001
                shutil.rmtree(tmp, ignore_errors=True)
                if any(s in str(exc) for s in (
                        "FileNotFound", "PATH_NOT_FOUND",
                        "does not exist")) and (
                            self._disk_version() != self.version):
                    # torn read under a real concurrent commit only
                    # (r12 ADVICE fix — see the same guard in
                    # _merge_once); unrelated missing files re-raise
                    self._reload_from_disk()
                    continue
                raise
            fault("after_data_write")

            moves, new_rows, new_stats = self._stage_moves(
                tmp, tmp_rel, token)
            retire = [os.path.basename(f) for f in old_files]
            if self.file_rows:
                files_rows = {name: rows
                              for name, rows in self.file_rows.items()
                              if name not in set(retire)}
            else:  # round-9 table before its first manifest
                files_rows = {
                    os.path.basename(p): _file_rows(p)
                    for p in _data_files(self.table_dir)
                    if os.path.basename(p) not in set(retire)}
            files_rows.update(new_rows)
            files_stats = {name: self.file_stats[name]
                           for name in files_rows
                           if name in self.file_stats}
            files_stats.update(new_stats)
            plan = {
                "tmp": tmp_rel,
                "moves": moves,
                "retire": retire,
                "ledger_batch": None,
                "meta": self._meta_dict(files_rows, files_stats),
            }
            if self._commit(plan, fault, expected_version=self.version):
                return len(write_buckets)
            shutil.rmtree(tmp, ignore_errors=True)
            self._reload_from_disk()
        raise RuntimeError(
            f"compact of {self.table_dir} lost the commit race "
            f"{MAX_COMMIT_RETRIES} times in a row")

    def _stage_moves(self, tmp: str, tmp_rel: str, token: str):
        """(moves, name→rows, name→col stats) for the bucket files a
        Spark job left under ``tmp`` — shared by merge and compact.
        Row counts and column min/max come from ONE footer open per
        file (no data pages), so manifest stats cost nothing extra at
        commit time — the Delta/Iceberg per-file-stats-in-the-txn-log
        design."""
        gen_tag = f"n{self.n_buckets:05d}"
        moves: list[tuple[str, str]] = []
        new_rows: dict[str, int] = {}
        new_stats: dict[str, dict] = {}
        for bdir in sorted(_glob.glob(os.path.join(tmp, f"{_BCOL}=*"))):
            b = int(os.path.basename(bdir).split("=", 1)[1])
            for i, f in enumerate(
                    sorted(_glob.glob(os.path.join(bdir, "*.parquet")))):
                dst = f"b{b:05d}-{gen_tag}-{token}-{i}.parquet"
                moves.append((
                    os.path.join(tmp_rel, os.path.basename(bdir),
                                 os.path.basename(f)),
                    dst))
                rows, stats = _file_footer(f, self.stats_cols)
                new_rows[dst] = rows
                if stats:
                    new_stats[dst] = stats
        return moves, new_rows, new_stats

    # -- merge ------------------------------------------------------
    def merge(self, batch: DataFrame,
              merge_fn: Callable[[DataFrame | None, DataFrame], DataFrame],
              batch_id: int | str | None = None,
              ledgered: bool = False,
              fault=None) -> None:
        """Merge one micro-batch into the table.

        ``merge_fn(current, batch)`` receives the stored rows of the
        CONSUMED buckets only (None on first write) plus the batch
        rows, and returns their merged replacement — per-merge-key
        semantics (latest-per-key, additive re-agg, SCD2 re-window)
        are safe on a bucket slice because a key's rows all live in
        one bucket (and an old-generation file's rows all live in the
        closed child set, which is consumed and rewritten whole).

        ``ledgered=True`` adds the applied-batch-id exactly-once guard
        (non-idempotent merges, e.g. additive sums); idempotent merges
        skip it and rely on replay convergence.

        ``fault`` is the kill-point hook the recovery tests use; the
        four labels match the round-7 suite stage-for-stage:
        after_data_write (tmp written, nothing visible),
        after_live_aside (marker published — the commit point),
        after_tmp_in (new files moved in), after_ledger_write.

        Concurrency (round 11): merges from CONCURRENT writers —
        threads or processes — are safe. The expensive work (bucket
        resolution, the Spark merge job, the tmp write) runs lock-
        free against the manifest snapshot this object last loaded;
        the commit itself CASes on the manifest version under the
        table's flock. A lost race re-reads the new manifest,
        re-merges the batch against the updated buckets, and retries
        (``conflicts_seen`` counts the losses) — optimistic
        concurrency exactly as a Delta txn log arbitrates OCC
        writers, and the multi-writer analogue of the reference's
        concurrent HBase dim writers (DimHBaseSinkFunction.java:
        16-105, where region-server row locks arbitrate Puts).
        """
        fault = fault or (lambda _stage: None)
        spark = batch.sparkSession
        self.recover()
        # start from the freshest committed manifest: another writer
        # may have advanced the table since this object was built —
        # merging against the newest snapshot makes first-try CAS
        # success the common case
        self._reload_from_disk()

        if ledgered and batch_id is None:
            raise ValueError("ledgered merge needs a batch_id")

        batch = batch.persist()
        self.conflicts_seen = 0
        try:
            for _attempt in range(MAX_COMMIT_RETRIES):
                if self._merge_once(spark, batch, merge_fn, batch_id,
                                    ledgered, fault):
                    return
                # lost the commit race: another writer advanced the
                # manifest between our read and our CAS — re-merge
                # against the new snapshot
                self.conflicts_seen += 1
                self._reload_from_disk()
            raise RuntimeError(
                f"merge into {self.table_dir} lost the commit race "
                f"{MAX_COMMIT_RETRIES} times in a row — writer starved")
        finally:
            batch.unpersist()

    def _merge_once(self, spark, batch, merge_fn, batch_id,
                    ledgered, fault) -> bool:
        """One optimistic merge attempt against the currently-loaded
        manifest. True = committed (or correctly skipped); False =
        commit CAS lost, caller reloads and retries."""
        if ledgered and str(batch_id) in self.applied_batches():
            # replayed batch: skip the merge but still EXECUTE the
            # batch plan so a stateful upstream commits its state
            # version (same contract as the round-7 sinks)
            batch.write.format("noop").mode("overwrite").save()
            return True

        bucketed = batch.withColumn(
            _BCOL, _bucket_of(self.keys, self.n_buckets))
        touched = sorted(
            r[0] for r in bucketed.select(_BCOL).distinct().collect())
        if not touched:
            # empty batch: ledger it (a replay must still skip) and
            # stop — nothing to rewrite. Under the lock: the ledger
            # file is read-modify-write
            if ledgered:
                with self._commit_lock():
                    self._recover_locked()
                    self._append_ledger(str(batch_id))
            return True

        legacy = _legacy_files(self.table_dir)
        full = bool(legacy)
        if not full and self.columns is not None:
            # schema evolution probe on the batch side: a new
            # column NAME, or a changed TYPE on a shared name
            # (parquet footers are type-strict), forces the
            # one-time full rewrite (docstring)
            if not set(batch.columns) <= set(self.columns):
                full = True
            elif self.fields is not None:
                full = any(
                    self.fields.get(f.name, f.dataType.simpleString())
                    != f.dataType.simpleString()
                    for f in batch.schema.fields)
        if full:
            write_buckets = list(range(self.n_buckets))
            old_files = _data_files(self.table_dir)
        else:
            old_files, write_buckets = self._resolve(touched)

        token = uuid.uuid4().hex[:12]
        # pid in the tmp name: recovery removes only DEAD writers'
        # orphans, never a live concurrent writer's in-flight output
        tmp_rel = f".tmp-{os.getpid()}-{token}"
        tmp = os.path.join(self.table_dir, tmp_rel)
        try:
            cur = None
            if old_files:
                cur = spark.read.parquet(*old_files)
            merged = merge_fn(cur, batch)
            if (not full and self.columns is not None
                    and set(merged.columns) < set(self.columns)):
                # narrow batch into empty buckets (cur is None — no
                # stored rows to unionByName against): conform to the
                # stored schema with typed nulls so every bucket file
                # keeps the full column set and plain readers never
                # silently lose columns (round-10 ADVICE fix)
                merged = merged.select(
                    *merged.columns,
                    *[F.lit(None).cast(self.fields[c]).alias(c)
                      for c in self.columns if c not in merged.columns])
            out_cols = list(merged.columns)
            out_fields = {f.name: f.dataType.simpleString()
                          for f in merged.schema.fields}
            merged = merged.withColumn(
                _BCOL, _bucket_of(self.keys, self.n_buckets))

            # one shuffle partition per written bucket → one file per
            # bucket per merge; untouched buckets cost nothing
            (merged.repartition(max(len(write_buckets), 1), F.col(_BCOL))
             .write.partitionBy(_BCOL).parquet(tmp))
        except Exception as exc:  # noqa: BLE001
            shutil.rmtree(tmp, ignore_errors=True)
            msg = str(exc)
            if any(s in msg for s in ("FileNotFound", "PATH_NOT_FOUND",
                                      "does not exist")):
                # a concurrent commit retired a file we were reading
                # mid-scan — a torn read; the reload+retry makes it a
                # plain conflict. r12 ADVICE fix: only if the manifest
                # version actually advanced — an unrelated missing
                # file (e.g. a deleted upstream source of the batch)
                # must surface, not silently re-merge 20 times.
                if self._disk_version() != self.version:
                    return False
            raise
        fault("after_data_write")

        moves, new_rows, new_stats = self._stage_moves(tmp, tmp_rel, token)
        retire = [os.path.basename(f) for f in old_files]
        prev_cols, prev_fields = self.columns, self.fields
        self.columns, self.fields = out_cols, out_fields
        if self.file_rows and not full:
            # manifest-based survivors (round 11): a directory listing
            # can include a concurrent committer's not-yet-retired old
            # files; the manifest cannot
            survivors = {name: rows
                         for name, rows in self.file_rows.items()
                         if name not in set(retire)}
        else:
            survivors = {
                os.path.basename(p): self.file_rows.get(
                    os.path.basename(p), None)
                for p in _data_files(self.table_dir)
                if os.path.basename(p) not in set(retire)
            }
        # survivor counts absent from meta (upgraded table) come
        # from the footer once, then ride the manifest forward
        files_rows = {
            name: (rows if rows is not None
                   else _file_rows(os.path.join(self.table_dir, name)))
            for name, rows in survivors.items()
        }
        files_rows.update(new_rows)
        files_stats = {name: self.file_stats[name]
                       for name in files_rows if name in self.file_stats}
        files_stats.update(new_stats)

        plan = {
            "tmp": tmp_rel,
            "moves": moves,
            "retire": retire,
            "ledger_batch": str(batch_id) if ledgered else None,
            "meta": self._meta_dict(files_rows, files_stats),
        }
        if not self._commit(plan, fault, expected_version=self.version):
            self.columns, self.fields = prev_cols, prev_fields
            shutil.rmtree(tmp, ignore_errors=True)
            return False
        self._maybe_grow(fault)
        return True
