"""plans.audit: the programmatic plan-shape API. Sanity: its counts
agree with the hand-pinned facts in tests/test_plans.py for known
queries, and assert_plan raises usefully."""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.plans import audit
from opendosm_parquet_to_sqlite_spark.plans.queries import QUERIES

from .conftest import SF0001


def test_star_denorm_report(spark):
    df = QUERIES["join_star_denorm"](spark, SF0001)
    r = audit.plan_report(df)
    assert r["n_broadcast_joins"] == 4
    assert r["n_sortmerge_joins"] == 0
    assert r["n_cartesian"] == 0
    assert r["has_python_udf"] is False
    assert r["n_scans"] >= 4
    # column pruning evidence: the fact scan's ReadSchema excludes
    # unused lineitem columns
    li = [s for s in r["scans"] if s["read_schema"] and "l_" in s["read_schema"]]
    assert li and all("l_shipdate" not in s["read_schema"] for s in li)


def test_pricing_summary_report(spark):
    df = QUERIES["pricing_summary"](spark, SF0001)
    r = audit.plan_report(df)
    # one hash shuffle (the agg) + one range shuffle (the output sort)
    assert r["n_hash_exchanges"] == 1
    assert r["n_range_exchanges"] == 1
    assert r["n_exchanges"] == 2
    assert r["n_broadcast_joins"] == 0


def test_pushed_filters_surface(spark):
    df = QUERIES["shipping_priority"](spark, SF0001)
    r = audit.plan_report(df)
    pushed = [s for s in r["scans"] if s["pushed_filters"]]
    assert pushed  # date/segment predicates reached at least one scan


def test_python_udf_detection(spark):
    df = QUERIES["ann_pq"](spark, SF0001)
    assert audit.plan_report(df)["has_python_udf"] is True


def test_assert_plan_passes_and_fails(spark):
    df = QUERIES["pricing_summary"](spark, SF0001)
    r = audit.assert_plan(df, n_hash_exchanges=1, n_sortmerge_joins=("<=", 0))
    assert r["n_hash_exchanges"] == 1
    with pytest.raises(AssertionError, match="n_exchanges"):
        audit.assert_plan(df, n_exchanges=0)
    with pytest.raises(KeyError):
        audit.assert_plan(df, not_a_fact=1)


def test_new_query_plan_shapes_via_assert_plan(spark):
    """Dogfood assert_plan on this round's newest queries — regressions
    in these shapes fail here, not in a bench mystery."""
    # release_gate: no joins at all; one corpus scan
    audit.assert_plan(
        QUERIES["release_gate"](spark, SF0001),
        n_sortmerge_joins=0, n_cartesian=0, n_scans=1,
    )
    # join_size_report: key-count aggs only — the join is key-table-sized
    audit.assert_plan(
        QUERIES["join_size_report"](spark, SF0001),
        n_cartesian=0, n_scans=("<=", 4),
    )
    # embedding_drift: no corpus-sized join; exchanges are dim-sized aggs
    audit.assert_plan(
        QUERIES["embedding_drift"](spark, SF0001),
        n_cartesian=0, n_sortmerge_joins=("<=", 1),
    )
    # fold_assign: pure narrow projection
    audit.assert_plan(
        QUERIES["fold_assign"](spark, SF0001),
        n_exchanges=0, n_scans=1, has_python_udf=False,
    )
    # returned_item_revenue: both dims broadcast, no cartesian
    audit.assert_plan(
        QUERIES["returned_item_revenue"](spark, SF0001),
        n_broadcast_joins=(">=", 2),
        n_cartesian=0,
    )
