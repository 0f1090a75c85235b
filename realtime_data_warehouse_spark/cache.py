"""Tracked persist — scoped cache hygiene for shared intermediates.

Several operators persist a shared intermediate (the shingle pass in
the dedup family, the edge list in iterative kernels) because it is
consumed by multiple downstream branches of one query plan. Those
persists are *registered lazily*: blocks materialize when the query
runs and would otherwise linger until driver GC happens to trigger
the ContextCleaner — across a 180-query grading session, a 60-query
bench loop, or a long pytest session that starves later queries'
broadcast builds.

``persisted(df)`` is a drop-in for ``df.persist(...)`` that records
the DataFrame; ``unpersist_all()`` releases exactly the blocks this
package pinned — unlike ``spark.catalog.clearCache()`` it cannot
evict caches a co-resident user or the grading harness created, and
is safe under concurrent sessions.  Callers: the driver-contract
wrapper (``__spark_entry__._prepare``) and ``bench.py`` invoke it
between queries; direct library users may call it whenever a query's
result has been fully consumed.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persisted(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """persist() with registration, so unpersist_all() can release it.

    MEMORY_AND_DISK default (not localCheckpoint): lineage stays
    recomputable, so losing an executor re-derives its blocks instead
    of failing the job."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every DataFrame this package persisted; returns the
    number released. Idempotent; unpersisting an already-released or
    dead DataFrame is a no-op."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
