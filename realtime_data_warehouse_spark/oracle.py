"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its ANSI-SQL oracle side by side on
the same parquet tables, normalizes both results (columns sorted by
name, rows sorted by every column, floats canonicalized), and
compares exactly — the same order-insensitive value-hash contract the
driver applies at sf0.01. Used by tests/test_oracle_parity.py so
mismatches surface before the driver sees them.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canonical(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(round(v, 9)) if v == v else "<null>"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df: DataFrame, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    got = spark_df.toPandas()
    want = oracle_df
    g_cols, w_cols = sorted(got.columns), sorted(want.columns)
    if g_cols != w_cols:
        return False, f"schema mismatch: spark={g_cols} oracle={w_cols}"
    if len(got) != len(want):
        return False, f"row count mismatch: spark={len(got)} oracle={len(want)}"
    g, w = _canonical(got), _canonical(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"


def check_query(spark: SparkSession, sf_dir: str, name: str) -> tuple[bool, str]:
    from .plans.registry import ORACLE_SQL, QUERIES

    fn = QUERIES[name]
    spark_df = fn(spark, sf_dir)
    if name not in ORACLE_SQL:
        n = spark_df.count()
        return n >= 0, f"rows-only check: {n} rows (no oracle declared)"
    con = duckdb_connection(sf_dir)
    try:
        oracle_df = con.execute(ORACLE_SQL[name]).fetchdf()
    finally:
        con.close()
    return compare(spark_df, oracle_df)
