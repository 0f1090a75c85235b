#!/usr/bin/env python
"""Measured shuffle-volume audit for the headline queries.

PLAN_AUDIT.json pins plan SHAPE (no cartesians, broadcasts where
expected); this audit pins plan COST: for every headline query it
records the actual bytes moved — input scanned, shuffle written,
shuffle read, spill — at $SPARK_GRAFT_SF_DIR, so "is there a shuffle
here that becomes the bottleneck at 100×?" is answered with data.
Byte counts are deterministic for a fixed layout and partitioning
(unlike seconds, they don't care about box load), which makes them
the right per-round regression signal for plan economics: a change
that silently turns a broadcast join into a shuffle join moves
shuffle_write by orders of magnitude even when the sf0.1 runtime
barely twitches.

Method: one tuned session with the UI status store exposed
(spark.ui.enabled=true on a private port — the only conf that
differs from the served session; it changes bookkeeping, not
plans), each query drained through the noop sink, stage-metric
totals snapshotted via the REST status API before/after — the
delta is that query's traffic. Tracked persists are released
between queries (bench.py discipline) so one query's cached blocks
don't mute the next one's scan.

Writes SHUFFLE.json and prints a markdown table; SHUFFLE.md at the
repo root is the committed interpretation.

Usage: python scripts/shuffle_audit.py [out_json]
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: inputRecords / shuffle*Records are exact; inputBytes is kept but
#: UNDERREPORTS with the vectorized parquet reader (observed: a
#: 600k-row 4-column lineitem scan reports ~18 KB — the FS-statistics
#: hook misses most positioned reads), so ratios are record-based.
_FIELDS = (
    "inputRecords", "inputBytes",
    "shuffleWriteBytes", "shuffleReadBytes", "shuffleWriteRecords",
    "memoryBytesSpilled", "diskBytesSpilled",
)


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SHUFFLE.json")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench  # repo-root bench: reuse ITS headline list verbatim
    from realtime_data_warehouse_spark.cache import unpersist_all
    from realtime_data_warehouse_spark.session import get_spark, tune_for_scale

    import __spark_entry__ as entry

    spark = get_spark("rdw-shuffle-audit", {
        "spark.ui.enabled": "true",
        "spark.ui.port": "4071",
        # keep every stage of the sweep in the status store: 21
        # queries × ~10 stages is well under this
        "spark.ui.retainedStages": "5000",
    })
    tune_for_scale(spark)
    queries = entry.queries()

    base = spark.sparkContext.uiWebUrl  # e.g. http://host:4071
    app_id = spark.sparkContext.applicationId

    def stage_totals() -> dict[str, int]:
        # the status store is fed by an async listener queue; drain it
        # or a query's scan bytes land in the NEXT query's window
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        url = f"{base}/api/v1/applications/{app_id}/stages"
        with urllib.request.urlopen(url) as r:
            stages = json.load(r)
        tot = dict.fromkeys(_FIELDS, 0)
        for st in stages:
            for f in _FIELDS:
                tot[f] += int(st.get(f) or 0)
        return tot

    results: dict[str, dict] = {}
    for name in bench.HEADLINE:
        before = stage_totals()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        unpersist_all()
        after = stage_totals()
        m = {f: after[f] - before[f] for f in _FIELDS}
        m["shuffled_rows_per_input_row"] = round(
            m["shuffleWriteRecords"] / max(m["inputRecords"], 1), 4)
        results[name] = m
        print(f"  {name}: in_rows={m['inputRecords']:,} "
              f"sw={m['shuffleWriteBytes']:,}B "
              f"sw_rows={m['shuffleWriteRecords']:,} "
              f"spill={m['memoryBytesSpilled'] + m['diskBytesSpilled']:,}",
              flush=True)

    payload = {"sf_dir": sf_dir, "fields": list(_FIELDS),
               "queries": results}
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    mb = 1024 * 1024
    print("\n| query | input rows | shuffle write MB | shuffled rows "
          "| rows shuffled / row scanned | spill MB |")
    print("|---|---|---|---|---|---|")
    for name, m in results.items():
        spill = (m["memoryBytesSpilled"] + m["diskBytesSpilled"]) / mb
        print(f"| {name} | {m['inputRecords']:,} "
              f"| {m['shuffleWriteBytes']/mb:.2f} "
              f"| {m['shuffleWriteRecords']:,} "
              f"| {m['shuffled_rows_per_input_row']:.3f} "
              f"| {spill:.1f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
