#!/usr/bin/env python
"""Result-hash snapshot tool for the round-12 optimization pass.

Computes the same order-insensitive canonical value-hash the oracle
gate uses, for named registry queries at any sf_dir, and writes/
compares a JSON snapshot — so a restructured query can be proven
result-identical at sf0.1 (where the DuckDB oracle is too slow /
unused) before and after the change.

Usage:
  python scripts/r12_hash.py write /tmp/hashes.json q1 q2 ...
  python scripts/r12_hash.py check /tmp/hashes.json q1 q2 ...
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from realtime_data_warehouse_spark.cache import unpersist_all  # noqa: E402
from realtime_data_warehouse_spark.oracle import _canonical  # noqa: E402
from realtime_data_warehouse_spark.plans.registry import QUERIES  # noqa: E402
from realtime_data_warehouse_spark.session import get_spark, tune_for_scale  # noqa: E402


def query_hash(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    pdf = df.toPandas()
    rows = _canonical(pdf)
    h = hashlib.sha256()
    h.update(repr(sorted(pdf.columns)).encode())
    for r in rows:
        h.update(repr(r).encode())
    unpersist_all()
    return f"{h.hexdigest()}:{len(rows)}"


def main() -> int:
    mode, path = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r12-hash")
    tune_for_scale(spark)
    if mode == "write":
        out = {n: query_hash(spark, n, sf_dir) for n in names}
        old = {}
        if os.path.exists(path):
            old = json.load(open(path))
        old.update(out)
        json.dump(old, open(path, "w"), indent=1)
        print(json.dumps(out, indent=1))
        return 0
    want = json.load(open(path))
    bad = 0
    for n in names:
        got = query_hash(spark, n, sf_dir)
        ok = want.get(n) == got
        bad += not ok
        print(f"{'MATCH   ' if ok else 'MISMATCH'} {n}  "
              f"want={want.get(n)} got={got}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
