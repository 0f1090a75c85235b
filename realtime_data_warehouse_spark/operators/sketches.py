"""Frequency-sketch operators — bounded-memory frequent-items at scale.

The reference has no sketch surface (its aggregations are exact keyed
windows); this module adds the scale-path frequent-items kernel a
100 TB pipeline needs when the key cardinality is too large to
shuffle in full: the classic distributed two-pass Misra–Gries.

Pass A (candidates) runs INSIDE the scan — an Arrow-batched
``mapInPandas`` keeps at most ``k = ceil(1/phi)`` counters per
partition and emits only the surviving keys, so the only data that
leaves the mappers is ``num_partitions × k`` candidate rows (vs the
full |distinct keys| shuffle of a naive groupBy). Pigeonhole gives
completeness: any key with global frequency ≥ phi·N has frequency
≥ phi·N_p in at least one partition p, and a Misra–Gries summary
with ≥ 1/phi counters never evicts a key holding ≥ phi of its
partition's rows — so every true heavy hitter survives somewhere.

Pass B (exact) semi-joins the input against the broadcast candidate
set and counts ONLY those keys — map-side partial aggregation over a
few hundred keys, one tiny exchange. False candidates die at the
final threshold filter, so the result is EXACT (identical to the
full groupBy + HAVING), which is what makes the operator
oracle-checkable while the intermediate state stays O(k) per task.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str,
                           phi: float) -> DataFrame:
    """Per-partition Misra–Gries survivors: a DataFrame of distinct
    candidate keys that is a SUPERSET of every key with global
    frequency ≥ phi·N. O(1/phi) memory per task; emits at most
    ceil(1/phi) rows per partition."""
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0,1), got {phi}")
    k = math.ceil(1.0 / phi)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # vectorized pre-reduce: batch value_counts, then fold the
            # bounded per-batch table into the bounded counter dict
            for key, cnt in pdf[key_col].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < k:
                    counters[key] = int(cnt)
                else:
                    # decrement-all by the smallest of (cnt, min c):
                    # batched form of the classic one-at-a-time MG
                    # decrement — equivalent summary guarantees
                    dec = min(int(cnt), min(counters.values()))
                    counters = {key2: c - dec
                                for key2, c in counters.items() if c > dec}
                    rem = int(cnt) - dec
                    if rem > 0 and len(counters) < k:
                        counters[key] = rem
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        summarize, schema=df.select(key_col).schema
    ).distinct()


def exact_heavy_hitters(df: DataFrame, key_col: str, phi: float,
                        count_alias: str = "cnt") -> DataFrame:
    """All keys with frequency ≥ ceil(phi·N), with their EXACT counts
    — result identical to ``GROUP BY key HAVING count ≥ ceil(phi·N)``
    but with bounded intermediate state (see module docstring).

    ``df.count()`` is a driver-side SCALAR off a count-only aggregate
    (no row data moves) — baked in as the threshold literal, same
    bounded-scalar discipline as the k-means centroid collects."""
    n = df.count()
    threshold = math.ceil(n * phi)
    cands = misra_gries_candidates(df, key_col, phi)
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .filter(F.col(count_alias) >= F.lit(threshold))
    )
