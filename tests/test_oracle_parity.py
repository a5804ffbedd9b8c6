"""The driver t2 gate, as a test: every oracle-backed query hash-matches
DuckDB at sf0.001 (fast); run tests/oracle_check.py at sf0.01 for the full
pre-round check."""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.plans.queries import QUERIES

from . import oracle_check
from .conftest import SF0001


@pytest.fixture(scope="module")
def duck():
    return oracle_check.duck_connection(SF0001)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    r = oracle_check.compare_one(spark, duck, name, SF0001)
    if name not in oracle_check.ALL_ORACLES:
        assert r["rows"] >= 0  # rows-only contract: runs and returns a frame
    else:
        assert r["status"] == "ok", r["status"]
