"""Pins for operators/stats.py against pure-Python closed forms — tiny
hand-checkable inputs where every intermediate (rank, tie run, moment) can
be verified by eye, plus the degenerate cases the NULLIF guards exist for."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import stats


def _ols_ref(pairs):
    n = len(pairs)
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxx = sum(p[0] * p[0] for p in pairs)
    syy = sum(p[1] * p[1] for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / varx if varx else None
    intercept = (sy - slope * sx) / n if slope is not None else None
    r2 = cov * cov / (varx * vary) if varx * vary else None
    return slope, intercept, r2


def test_group_ols_matches_closed_form(spark):
    pairs = [(1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8), (5.0, 10.1)]
    df = spark.createDataFrame([("g", x, y) for x, y in pairs], "g string, x double, y double")
    row = stats.group_ols(df, "x", "y", "g").collect()[0]
    slope, intercept, r2 = _ols_ref(pairs)
    assert row["n"] == 5
    assert row["slope"] == pytest.approx(slope, abs=1e-6)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert row["r2"] == pytest.approx(r2, abs=1e-6)


def test_group_ols_degenerate_and_null_pairs(spark):
    df = spark.createDataFrame(
        [
            ("const_x", 1.0, 2.0), ("const_x", 1.0, 5.0),  # varx = 0
            ("const_y", 1.0, 3.0), ("const_y", 2.0, 3.0),  # vary = 0
            ("nulls", 1.0, 1.0), ("nulls", 2.0, None), ("nulls", None, 9.0),
            ("nulls", 3.0, 3.0),
        ],
        "g string, x double, y double",
    )
    out = {r["g"]: r for r in stats.group_ols(df, "x", "y", "g").collect()}
    assert out["const_x"]["slope"] is None
    assert out["const_x"]["intercept"] is None
    assert out["const_x"]["r2"] is None
    # vary = 0: perfect horizontal fit, slope 0, r2 NULL (0/0)
    assert out["const_y"]["slope"] == pytest.approx(0.0)
    assert out["const_y"]["intercept"] == pytest.approx(3.0)
    assert out["const_y"]["r2"] is None
    # NULL on either side excludes the PAIR, not the group
    assert out["nulls"]["n"] == 2
    assert out["nulls"]["slope"] == pytest.approx(1.0)


def test_chi_square_hand_example(spark):
    # classic 2x2: rows (10, 20) / (20, 10); n=60, all e=15
    # chi2 = 4 * (5^2/15) = 6.666667, dof = 1
    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 20 + [("r2", "c2")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    row = stats.chi_square_independence(df, "a", "b").collect()[0]
    assert row["chi2"] == pytest.approx(20.0 / 3.0, abs=1e-6)
    assert row["dof"] == 1
    assert row["n"] == 60


def test_chi_square_independent_uniform_is_zero(spark):
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(7)]
    df = spark.createDataFrame(rows, "a string, b string")
    row = stats.chi_square_independence(df, "a", "b").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)


def _mwu_ref(a_vals, b_vals):
    """Midrank U and tie-corrected z, straight from the textbook."""
    allv = sorted([(v, 0) for v in a_vals] + [(v, 1) for v in b_vals])
    vals = [v for v, _ in allv]
    midrank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        for k in range(i, j):
            midrank.setdefault(vals[i], (i + 1 + j) / 2.0)
        i = j
    ra = sum(midrank[v] for v in a_vals)
    na, nb = len(a_vals), len(b_vals)
    n = na + nb
    u = ra - na * (na + 1) / 2.0
    runs = {}
    for v in vals:
        runs[v] = runs.get(v, 0) + 1
    tie_term = sum(t**3 - t for t in runs.values())
    sigma2 = (na * nb / 12.0) * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(sigma2) if sigma2 > 0 else None
    return u, z


def test_mann_whitney_no_overlap_and_ties(spark):
    cases = {
        "sep": ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),   # U = 0
        "tied": ([1.0, 2.0, 2.0, 3.0], [2.0, 3.0, 3.0, 4.0]),
    }
    rows = []
    for g, (a, b) in cases.items():
        rows += [(g, v, 1) for v in a] + [(g, v, 0) for v in b]
    df = spark.createDataFrame(rows, "g string, v double, side int")
    out = {r["g"]: r for r in
           stats.mann_whitney_u(df, "v", "side", 1, "g").collect()}
    for g, (a, b) in cases.items():
        u, z = _mwu_ref(a, b)
        assert out[g]["n_a"] == len(a) and out[g]["n_b"] == len(b)
        assert out[g]["u"] == pytest.approx(u, abs=1e-6), g
        assert out[g]["z"] == pytest.approx(z, abs=1e-6), g
    assert out["sep"]["u"] == pytest.approx(0.0)


def test_mann_whitney_all_tied_is_null_z(spark):
    df = spark.createDataFrame(
        [("g", 5.0, 1), ("g", 5.0, 1), ("g", 5.0, 0), ("g", 5.0, 0)],
        "g string, v double, side int",
    )
    row = stats.mann_whitney_u(df, "v", "side", 1, "g").collect()[0]
    assert row["z"] is None  # sigma = 0 under total ties


def test_mann_whitney_detects_shift(spark):
    # b shifted +1: z must be clearly negative for side a (lower ranks)
    a = [float(i % 13) for i in range(200)]
    b = [float(i % 13) + 1.0 for i in range(200)]
    rows = [("g", v, 1) for v in a] + [("g", v, 0) for v in b]
    df = spark.createDataFrame(rows, "g string, v double, side int")
    row = stats.mann_whitney_u(df, "v", "side", 1, "g").collect()[0]
    assert row["z"] < -2.0


def test_mann_whitney_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [("g", float(i % 7), i % 2) for i in range(100)],
        "g string, v double, side int",
    )
    plan = stats.mann_whitney_u(df, "v", "side", 1, "g")._jdf \
        .queryExecution().executedPlan().toString()
    # midrank + peer count share ONE sort/partitioning; the only
    # exchanges are the window's and the final agg's
    assert plan.lower().count("exchange") <= 2, plan
