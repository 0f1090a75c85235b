"""Local replica of the driver's correctness gate: every registered
query must hash-match its DuckDB oracle on the small fixtures."""

from __future__ import annotations

import pytest

from realtime_data_warehouse_spark.oracle import check_query
from realtime_data_warehouse_spark.plans.registry import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf_small(spark, sf_small, name):
    ok, msg = check_query(spark, sf_small, name)
    assert ok, f"{name}: {msg}"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf_medium(spark, sf_medium, name):
    ok, msg = check_query(spark, sf_medium, name)
    assert ok, f"{name}: {msg}"
