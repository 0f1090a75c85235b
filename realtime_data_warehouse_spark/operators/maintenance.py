"""Table maintenance verbs (the OPTIMIZE side of a lakehouse).

The bench's ingest-compaction pass and the streaming sinks both
re-lay-out parquet directories ad hoc; this module gives the verb a
first-class, crash-safe form — the local analogue of Delta
`OPTIMIZE` / Iceberg `rewrite_data_files` (unavailable in this
container, see README "Delta/Iceberg attempts").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..streaming.sinks import _recover_table, _swap_in


def table_bytes(table_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def optimize_table(spark: SparkSession, table_dir: str,
                   target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Compact a parquet table directory to ~target-sized files.

    Reads the current layout, round-robin repartitions to
    ceil(bytes / target) output files, writes a sibling tmp dir and
    swaps it in with the same rename-aside + crash-recovery protocol
    the streaming MERGE sinks use (streaming/sinks._swap_in) — at
    every step an intact copy of the table exists on disk. Data is
    byte-identical, only re-laid-out.

    Scale note: file-count math uses on-disk (compressed) bytes, so
    post-compaction row groups land near the scan-task size
    `tune_for_scale` assumes; on a real lakehouse this verb is the
    scheduled small-file compaction every ingest pipeline runs.
    Returns the number of output files written."""
    _recover_table(table_dir)
    n_files = max(1, -(-table_bytes(table_dir) // target_file_bytes))
    df = spark.read.parquet(table_dir).repartition(n_files)
    tmp = table_dir.rstrip("/") + ".__new__"
    df.write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, table_dir)
    return n_files
