"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``realtime_data_warehouse_spark``
package; this module is only the registry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_data_warehouse_spark.cache import unpersist_all  # noqa: E402
from realtime_data_warehouse_spark.plans.registry import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)
from realtime_data_warehouse_spark.shipping import (  # noqa: E402
    export_pythonpath,
    ship_package,
)

# Python workers must import this package for pandas-UDF stages even
# when the driver wasn't launched from the repo root.
export_pythonpath()


def _prepare(spark: SparkSession) -> None:
    # Registry queries persist shared intermediates (shingle passes,
    # converge-loop edges). A grading session runs MANY queries back
    # to back on a default-memory driver, and cached blocks pinned by
    # earlier queries' plans would eventually starve later queries'
    # broadcast builds — so each wrapped query starts from a clean
    # block store. unpersist_all releases exactly the blocks THIS
    # package pinned (tracked via cache.persisted) — unlike the
    # session-global clearCache it cannot evict caches the grading
    # harness or a co-resident user created. Within-query persists
    # are registered lazily and materialize after this call, so they
    # are unaffected.
    unpersist_all()
    # Broadcast pieces and localCheckpoint blocks are freed only when
    # a JVM GC feeds the ContextCleaner's reference queue, and Spark's
    # own periodic GC defaults to every 30 MINUTES — longer than an
    # entire grading sweep. On a default-heap (1g) driver, ~150
    # queries of accumulated dead broadcasts can OOM a later query's
    # broadcast build (observed: full-registry sweep died in
    # dedup_clusters). Collect Python first so Py4J proxies release
    # their JVM references, then hint the JVM GC. Private-bridge
    # guarded: under Spark Connect there is no _jvm — skip silently
    # (Connect drivers are remote and not our heap anyway).
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # see session.py: the inferred size()>0 filter from explode()
    # re-derives interpreted shingle expressions per row — a large
    # pessimization for the dedup family; runtime-settable SQL conf.
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    return QUERIES["dws_traffic_page_view_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same aliases)."""
    return dict(ORACLE_SQL)
