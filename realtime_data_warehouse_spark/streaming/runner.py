"""availableNow replay runner — deterministic stream execution.

The reference validates pipelines by replaying Kafka topics and
eyeballing output (SURVEY §5); our substitute is
`trigger(availableNow=True)`: consume everything currently in the
source as a bounded sequence of micro-batches, run the no-data batch
that lets the watermark close windows, then stop. The same code path
(checkpointing, state store, watermark bookkeeping) a 24/7 job uses —
exercised as a finite, assertable run.

Scale note: availableNow is also the production backfill story — the
identical query graph that runs continuously can re-run over months of
retained files without a separate batch codepath (Kappa architecture,
SURVEY intro).
"""

from __future__ import annotations

import math
import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Rows of per-batch input per shuffle partition that keep a replay's
#: state-store commits meaningfully sized — the round-7 partition
#: ladder measured the 4-way chain at 42.2/20.3/11.3/8.3 s for
#: 32/16/8/4 partitions on ~200k-row batches (identical output), i.e.
#: the knee sits around 25k rows/partition; below that, the per-store
#: commit overhead dominates the drain.
TARGET_ROWS_PER_PARTITION = 25_000


def staged_batch_rows(path: str, one_file_per_batch: bool = True) -> int:
    """Per-micro-batch input volume of a staged replay directory,
    from parquet FOOTERS only (no scan, no Spark job). With
    ``maxFilesPerTrigger=1`` one part file IS one micro-batch's input
    for that side, so the per-batch volume is the largest file's row
    count; an un-throttled side arrives whole in batch 1, so its
    volume is the directory total."""
    import pyarrow.parquet as pq

    rows = [
        pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    if not rows:
        return 0
    return max(rows) if one_file_per_batch else sum(rows)


def shuffle_for_volume(rows_per_batch: int,
                       target: int = TARGET_ROWS_PER_PARTITION,
                       lo: int = 2, hi: int = 256) -> int:
    """Shuffle-partition count sized to per-batch data volume — the
    rule `pinned_shuffle`'s docstring states, computed instead of
    hand-tuned (round-7 verdict item 4): n = ⌈rows_per_batch/target⌉,
    clamped. At the round-7 ladder's corpus (~200k rows/batch, sf0.1)
    this reproduces the measured-optimal 8; at 100× the volume it
    scales to ~800 partitions' worth of demand (clamped at `hi`,
    which a real cluster would raise with its core count) with no
    retuning, and at sf0.01 replays it drops to the floor instead of
    paying 4× the no-op commits."""
    return max(lo, min(hi, math.ceil(max(1, rows_per_batch) / target)))


@contextmanager
def pinned_shuffle(spark: SparkSession, n: int):
    """Pin spark.sql.shuffle.partitions for one streaming drain and
    restore the session value after. Stream-stream joins commit one
    state-store delta per partition per stateful op per micro-batch,
    and for replay-sized batches those commits ARE the drain cost —
    measured on the 4-way chain (round 7, 100k-order corpus,
    identical output at every setting): 42.2 / 20.3 / 11.3 / 8.3 s at
    32 / 16 / 8 / 4 partitions, and 222 s on an untuned 200-partition
    session. Size the pin to per-batch data volume (each partition's
    per-batch state delta meaningfully sized), not to core count; the
    count is baked into the query's checkpoint, so callers use a
    fresh checkpoint per invocation (they do — out/ck are
    per-invocation tmpdirs)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


#: Per-drain micro-batch progress (round 11, the latency bench's
#: feed): every completed run_available_now / run_foreach_batch drain
#: appends its query's recentProgress list (one entry per micro-batch
#: = one staged file under maxFilesPerTrigger=1). bench.py clears it,
#: runs an entry, and reads per-batch trigger latencies — the
#: reference's actual SLO (5 s checkpoint cadence, BaseApp.java:30-33)
#: is a PER-BATCH budget that drain-throughput numbers cannot show.
#: Bounded: callers clear it; a drain appends at most
#: numRecentProgressUpdates (default 100) dicts.
RECENT_DRAINS: list[list[dict]] = []

#: r12 ADVICE fix: concurrent drains (threaded streaming tests, a
#: future parallel bench) could interleave appends with a reader's
#: clear()/read and misattribute one query's progress to another run;
#: all mutation goes through this lock. Readers that clear-then-read
#: single-threaded (bench.py) are unaffected.
_DRAINS_LOCK = __import__("threading").Lock()


def _await_drained(q, timeout_s: int) -> None:
    """awaitTermination(timeout) RETURNS (False) when the query is
    still running — callers that then read the output dir see a
    silently PARTIAL drain. Found the hard way (round 8): the 1M-key
    gapfill scaling drain ran past the old default and its output
    assertion read 3.08M of 5M rows mid-drain. A replay harness must
    never hand back partial results, so expiry now stops the query
    and raises instead of returning."""
    done = q.awaitTermination(timeout_s)
    try:
        import json as _json  # noqa: PLC0415
        progress = [_json.loads(p.json) for p in q.recentProgress]
        with _DRAINS_LOCK:
            RECENT_DRAINS.append(progress)
            del RECENT_DRAINS[:-50]  # bound: long sweeps drain hundreds
    except Exception:  # noqa: BLE001  (progress is observability only)
        pass
    if done:
        return
    q.stop()
    q.awaitTermination(30)
    raise TimeoutError(
        f"streaming drain still running after {timeout_s}s — raise "
        f"timeout_s; a partial read here would be silent corruption")


def run_available_now(sdf: DataFrame, out_dir: str, checkpoint_dir: str,
                      output_mode: str = "append",
                      timeout_s: int = 1800) -> None:
    """Write a streaming DataFrame to parquet until the source drains.

    Parquet sink is append-only (K1/K3 analogue: FlinkSinkUtil.java:22-33
    → files instead of Kafka/Doris). Checkpoint dir gives exactly-once
    file output across restarts — the 2PC role of BaseApp.java:28-41.
    Raises TimeoutError (after stopping the query) if the drain
    outlives timeout_s — never returns with a partial drain."""
    q = (
        sdf.writeStream.format("parquet")
        .outputMode(output_mode)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def run_foreach_batch(sdf: DataFrame, batch_fn, checkpoint_dir: str,
                      output_mode: str = "update",
                      timeout_s: int = 1800) -> None:
    """Drive a stream through a foreachBatch sink until drained.
    Same no-partial-drain contract as run_available_now."""
    q = (
        sdf.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def read_back(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a replay's parquet output (empty dir → empty result is a
    caller-level assertion failure, surfaced as AnalysisException).
    Merge-table dirs are read via their committed-file manifest
    (merge_table.read_table) so a reader racing a writer's crash
    window sees one consistent snapshot; plain append-sink dirs have
    no manifest and fall back to the directory read."""
    from .merge_table import read_table  # noqa: PLC0415

    return read_table(spark, out_dir)


def staged_files_dir(df: DataFrame, base_dir: str, n_files: int = 1,
                     order_col: str | None = None) -> str:
    """Materialize a batch DataFrame as `n_files` parquet files under
    `base_dir/in` so a file_stream with maxFilesPerTrigger=1 replays it
    as n_files micro-batches — the harness for multi-batch state tests
    (A6–A8 twins must converge across batch boundaries, not just within
    one batch).

    With order_col, rows are range-split by that column so earlier
    files hold earlier event times — matching a Kafka topic's rough
    time order and keeping watermark semantics meaningful.
    """
    in_dir = os.path.join(base_dir, "in")
    if order_col is not None:
        df = df.repartitionByRange(n_files, order_col)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(in_dir)
    # FileStreamSource orders files by modification time; one bulk
    # write gives every part file the same mtime, making batch order
    # nondeterministic. Stamp strictly increasing mtimes so part-N
    # (range N under repartitionByRange) replays as micro-batch N.
    parts = sorted(
        f for f in os.listdir(in_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = int(time.time()) - len(parts) - 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(in_dir, f), (base + i, base + i))
    return in_dir


def staged_files_dir_keyed(df: DataFrame, base_dir: str, key_col: str,
                           order_col, n_files: int = 3) -> str:
    """Stage a replay with the KEYED-TOPIC arrival contract instead of
    global event-time order: per-key event-time order is preserved
    (each key's rows split into n_files contiguous rank ranges, range
    k in micro-batch k), but CROSS-KEY alignment is scrambled — batch
    k holds key A's k-th quantile of events next to key B's, whatever
    their absolute timestamps, so the global interleaving is
    arbitrary and batch boundaries no longer coincide with global
    time. This is what a 100 TB Kafka replay actually delivers: a
    keyed topic guarantees per-partition (hence per-key) order and
    nothing across keys (reference T1's bounded out-of-orderness,
    DwsTradeSkuOrderWindow.java:213-221, is the per-key slack on top).
    The round-9 disorder-parity tests replay the journey operators
    through BOTH stagings and assert identical output — the keyed
    per-key-state kernels must not care about cross-key order.
    """
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    in_dir = os.path.join(base_dir, "in")
    # order_col may be a list: per-key ties on the time column must
    # split deterministically (e.g. (ts, tag, id) for the as-of
    # stream — a right row tied with its left must not land in a
    # LATER batch than the left, or the inclusive match is lost)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    ranked = (
        df.withColumn("__r", F.row_number().over(w) - 1)
        .withColumn("__c", F.count(F.lit(1)).over(
            Window.partitionBy(key_col)))
        .withColumn("__f", (F.col("__r") * n_files / F.col("__c"))
                    .cast("int"))
    )
    # HARD REQUIREMENT: (key_col, *order_cols) must order rows
    # uniquely. row_number over a non-unique order is nondeterministic
    # across executions, and the split used to re-execute the ranked
    # plan once per file — a tie could land a row in two splits or
    # none. Round 10 closes both holes: the split assignment is
    # MATERIALIZED once (single Spark job, one file per __f value) so
    # every row is written exactly once whatever the tie order, and
    # the uniqueness contract is asserted below (duplicate full
    # ordering keys would make "per-key order preserved" itself
    # ill-defined, so they are a caller bug, not a tolerable input).
    dup = (df.groupBy(key_col, *order_cols).count()
           .filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise ValueError(
            "staged_files_dir_keyed: (key_col, order_cols) must be "
            "unique per row — found duplicate ordering keys; add a "
            "tie-breaker column (e.g. an id) to order_col")
    stage = in_dir + ".__stage__"
    (ranked.drop("__r", "__c")
     .repartition(1)  # one writer task → exactly one file per __f dir
     .write.mode("overwrite").partitionBy("__f").parquet(stage))
    os.makedirs(in_dir, exist_ok=True)
    # move each split's single file to a deterministic flat name;
    # mtimes are stamped from the KNOWN split index (not getmtime of
    # racy separate writes), so split k replays as micro-batch k
    base = int(time.time()) - n_files - 10
    for k in range(n_files):
        fdir = os.path.join(stage, f"__f={k}")
        if not os.path.isdir(fdir):
            continue  # globally empty split (every key had < k rows)
        parts = sorted(
            f for f in os.listdir(fdir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        assert len(parts) == 1, (
            f"expected exactly one file for split {k}, got {parts}")
        dst = os.path.join(in_dir, f"part-{k:05d}-keyed.parquet")
        os.replace(os.path.join(fdir, parts[0]), dst)
        os.utime(dst, (base + k, base + k))
    import shutil  # noqa: PLC0415

    shutil.rmtree(stage, ignore_errors=True)
    return in_dir


def staged_files_dir_bounded_late(df: DataFrame, base_dir: str,
                                  ts_col: str, jitter_cols,
                                  slack: int, n_files: int = 4) -> str:
    """Stage a replay with BOUNDED PER-KEY LATENESS — the third
    arrival contract (between staged_files_dir's global event-time
    order and staged_files_dir_keyed's arbitrary cross-key shuffle):
    each row's ARRIVAL position is its event time plus a
    deterministic jitter in [0, slack) (hash of `jitter_cols`), and
    files are range-split on that arrival key. Rows therefore arrive
    out of event-time order, but once any row with event time T has
    been delivered, every still-undelivered row has event time
    > T − slack — for every key, since arrival ≥ event time always
    and arrival < event time + slack always. This is exactly the
    reference's forBoundedOutOfOrderness contract
    (DwsTradeSkuOrderWindow.java:213-221) made physical; the
    watermark-buffered kernels (stateful.asof_enrich_stream_exact)
    are certified EXACT on it. The ``__arr`` column rides along in
    the staged files; streams exclude it via their explicit schema.
    """
    return staged_files_dir(
        df.withColumn(
            "__arr",
            F.col(ts_col)
            + F.pmod(F.xxhash64(*[F.col(c) for c in jitter_cols]),
                     F.lit(int(slack)))),
        base_dir, n_files=n_files, order_col="__arr",
    )


def append_final_file(in_dir: str, df: DataFrame) -> None:
    """Append `df` as the LAST micro-batch of a staged replay dir:
    one extra part file stamped with an mtime above every existing
    file (FileStreamSource replays in mtime order). Used for
    end-of-stream punctuation rows (stateful.ASOF_FLUSH_TAG)."""
    before = set(os.listdir(in_dir))
    df.coalesce(1).write.mode("append").parquet(in_dir)
    added = [f for f in os.listdir(in_dir)
             if f not in before and f.startswith("part-")
             and f.endswith(".parquet")]
    assert len(added) == 1, added
    last = max(
        (os.path.getmtime(os.path.join(in_dir, f))
         for f in before if f.startswith("part-")), default=0)
    stamp = max(int(last) + 1, int(time.time()) - 5)
    os.utime(os.path.join(in_dir, added[0]), (stamp, stamp))
