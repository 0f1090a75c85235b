"""Tests for the two-pass Misra–Gries heavy-hitters kernel."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_data_warehouse_spark.operators.sketches import (
    exact_heavy_hitters,
    misra_gries_candidates,
)


def _brute(rows: list[int], phi: float) -> dict[int, int]:
    import math
    from collections import Counter

    c = Counter(rows)
    t = math.ceil(len(rows) * phi)
    return {k: v for k, v in c.items() if v >= t}


def test_exact_heavy_hitters_matches_bruteforce_skewed(spark):
    # 40% on key 1, 20% on key 2, long uniform tail
    rows = [1] * 400 + [2] * 200 + list(range(100, 500))
    df = spark.createDataFrame([(r,) for r in rows], "hh_key long")
    df = df.repartition(8)  # force multi-partition summaries
    got = {r.hh_key: r.cnt
           for r in exact_heavy_hitters(df, "hh_key", 0.05).collect()}
    assert got == _brute(rows, 0.05)
    assert got[1] == 400 and got[2] == 200


def test_exact_heavy_hitters_empty_when_uniform(spark):
    rows = list(range(1000))  # every key exactly once
    df = spark.createDataFrame([(r,) for r in rows], "hh_key long")
    assert exact_heavy_hitters(df, "hh_key", 0.01).count() == 0


def test_candidates_are_complete_superset(spark):
    """Every true phi-heavy key must appear among the per-partition
    Misra-Gries survivors regardless of how rows are partitioned —
    the pigeonhole completeness the exact pass relies on."""
    rows = [7] * 120 + [13] * 60 + list(range(1000, 1800))
    df = spark.createDataFrame([(r,) for r in rows], "hh_key long")
    for parts in (1, 3, 16):
        cands = {
            r.hh_key
            for r in misra_gries_candidates(
                df.repartition(parts), "hh_key", 0.1).collect()
        }
        assert set(_brute(rows, 0.1)) <= cands


def test_counts_are_exact_not_estimates(spark):
    """The MG estimates are never emitted: pass B recounts, so counts
    equal the plain groupBy's bit-for-bit."""
    rows = [5] * 300 + [9] * 150 + list(range(50)) * 3
    df = spark.createDataFrame([(r,) for r in rows], "hh_key long").repartition(4)
    hh = exact_heavy_hitters(df, "hh_key", 0.2)
    full = (df.groupBy("hh_key").agg(F.count(F.lit(1)).alias("cnt")))
    joined = hh.alias("a").join(full.alias("b"), "hh_key")
    assert joined.filter(F.col("a.cnt") != F.col("b.cnt")).count() == 0


def test_phi_validation():
    with pytest.raises(ValueError):
        misra_gries_candidates(None, "k", 0.0)
    with pytest.raises(ValueError):
        misra_gries_candidates(None, "k", 1.5)
