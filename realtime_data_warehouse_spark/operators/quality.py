"""Declarative data-quality expectations (a deequ/Great-Expectations
lite): named checks evaluated in as few passes as possible, emitting
one uniform violations report `(check, violations, n_rows)`.

Three check shapes, three plan shapes:
  * row predicates     — ALL checks fold into ONE aggregate over ONE
                         scan (a sum(when(!p,1)) per check; map-side
                         partials, no shuffle beyond the final 1-row
                         agg)
  * uniqueness         — one groupBy on the key: violations = extra
                         copies beyond the first (sum(cnt) - count(*)
                         of the grouped table)
  * referential (FK)   — left anti join child→parent on the key;
                         broadcast the parent when it is dim-sized

The report is rows, so it lands in the same oracle/hash gate as any
query — data-quality results are data, not log lines.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check_name", "violations", "n_rows")


def expect_rows(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """Evaluate every row-predicate check in ONE aggregate pass.
    A violation is a row where the predicate is NOT satisfied (null
    predicate counts as a violation — null-hostile by design, the
    conservative reading for quality gates)."""
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, (_name, cond) in enumerate(checks.items())
    ]
    row = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    reports = F.array(*[
        F.struct(
            F.lit(name).alias("check_name"),
            F.col(f"__v_{i}").cast("long").alias("violations"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        for i, name in enumerate(checks)
    ])
    return row.select(F.explode(reports).alias("r")).select("r.*")


def expect_unique(df: DataFrame, cols: list[str],
                  check_name: str | None = None) -> DataFrame:
    """Uniqueness check: violations = rows beyond the first per key
    (so a key appearing 3× contributes 2). One shuffle on the key,
    map-side combined."""
    name = check_name or f"unique({','.join(cols)})"
    grouped = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
    return grouped.agg(
        F.lit(name).alias("check_name"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("violations"),
        F.sum("c").cast("long").alias("n_rows"),
    )


def expect_fk(child: DataFrame, key: str, parent: DataFrame,
              parent_key: str, check_name: str | None = None,
              broadcast_parent: bool = True) -> DataFrame:
    """Referential-integrity check: violations = child rows whose key
    has no match in the parent (null keys are orphans too). Anti join;
    broadcast the parent side when it is dim-sized (default), else a
    shuffled anti join on the key."""
    name = check_name or f"fk({key}->{parent_key})"
    p = (parent.select(F.col(parent_key).alias("__pk")).distinct()
         .withColumn("__hit", F.lit(1)))
    if broadcast_parent:
        p = F.broadcast(p)
    marked = child.join(p, child[key] == p["__pk"], "left")
    return marked.agg(
        F.lit(name).alias("check_name"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("long").alias("violations"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def quality_report(*reports: DataFrame) -> DataFrame:
    """Union per-shape reports into the single expectations table."""
    out = reports[0].select(*_REPORT_COLS)
    for r in reports[1:]:
        out = out.unionByName(r.select(*_REPORT_COLS))
    return out
