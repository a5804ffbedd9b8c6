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


# --- average_precision --------------------------------------------------------


def test_average_precision_hand_example(spark):
    # ranking by score desc: ids 1..5, labels [1,0,1,1,0]
    # AP = (1/1 + 2/3 + 3/4) / 3 = 0.805556
    rows = [
        ("g", 5.0, 1, True),
        ("g", 4.0, 2, False),
        ("g", 3.0, 3, True),
        ("g", 2.0, 4, True),
        ("g", 1.0, 5, False),
    ]
    df = spark.createDataFrame(rows, "g string, s double, id int, y boolean")
    row = stats.average_precision(df, "s", "y", "id", "g").collect()[0]
    assert row["n"] == 5 and row["n_pos"] == 3
    assert row["ap"] == pytest.approx((1.0 + 2 / 3 + 3 / 4) / 3, abs=1e-6)


def test_average_precision_perfect_and_worst_ranking(spark):
    perfect = [("p", float(10 - i), i, i < 3) for i in range(6)]
    worst = [("w", float(10 - i), i, i >= 3) for i in range(6)]
    df = spark.createDataFrame(
        perfect + worst, "g string, s double, id int, y boolean"
    )
    out = {r["g"]: r for r in stats.average_precision(df, "s", "y", "id", "g").collect()}
    assert out["p"]["ap"] == pytest.approx(1.0)
    # worst: positives at ranks 4,5,6 -> (1/4 + 2/5 + 3/6)/3
    assert out["w"]["ap"] == pytest.approx((0.25 + 0.4 + 0.5) / 3, abs=1e-6)


def test_average_precision_tie_break_by_id_and_no_positives(spark):
    # tied scores: id order decides. ids 1(pos),2(neg) tied at 5.0 ->
    # pos first -> AP=1. Flip labels -> pos second -> AP=0.5.
    df = spark.createDataFrame(
        [
            ("a", 5.0, 1, True), ("a", 5.0, 2, False),
            ("b", 5.0, 1, False), ("b", 5.0, 2, True),
            ("none", 1.0, 1, False),
        ],
        "g string, s double, id int, y boolean",
    )
    out = {r["g"]: r for r in stats.average_precision(df, "s", "y", "id", "g").collect()}
    assert out["a"]["ap"] == pytest.approx(1.0)
    assert out["b"]["ap"] == pytest.approx(0.5)
    assert out["none"]["ap"] is None  # zero positives -> NULL, not 0


# --- cohens_kappa -------------------------------------------------------------


def test_cohens_kappa_hand_example(spark):
    # classic 2x2: a/b agree on 45 yes + 15 no of 100;
    # marginals a: 50/50, b: 60/40 -> pe = .5*.6+.5*.4 = .5 -> k=0.2
    rows = (
        [("g", "y", "y")] * 45
        + [("g", "y", "n")] * 5
        + [("g", "n", "y")] * 15
        + [("g", "n", "n")] * 35
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    row = stats.cohens_kappa(df, "a", "b", "g").collect()[0]
    assert row["n"] == 100
    assert row["po"] == pytest.approx(0.80)
    assert row["pe"] == pytest.approx(0.50)
    assert row["kappa"] == pytest.approx(0.6, abs=1e-6)


def test_cohens_kappa_identical_and_degenerate(spark):
    df = spark.createDataFrame(
        [
            # identical raters over 3 classes -> kappa 1
            ("same", "x", "x"), ("same", "y", "y"), ("same", "z", "z"),
            # both raters constant -> pe=1 -> NULL kappa
            ("const", "x", "x"), ("const", "x", "x"),
            # disjoint label spaces -> po=0, pe=0 -> kappa 0
            ("disj", "x", "y"), ("disj", "x", "y"),
            # NULL on either side excluded
            ("same", None, "x"), ("same", "x", None),
        ],
        "g string, a string, b string",
    )
    out = {r["g"]: r for r in stats.cohens_kappa(df, "a", "b", "g").collect()}
    assert out["same"]["n"] == 3 and out["same"]["kappa"] == pytest.approx(1.0)
    assert out["const"]["kappa"] is None
    assert out["disj"]["kappa"] == pytest.approx(0.0)


# --- cramers_v ----------------------------------------------------------------


def test_cramers_v_perfect_association_is_one(spark):
    rows = [("g", c, c.upper()) for c in ["x", "y", "z"] for _ in range(7)]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    row = stats.cramers_v(df, "a", "b", "g").collect()[0]
    assert row["levels_a"] == 3 and row["levels_b"] == 3
    assert row["v"] == pytest.approx(1.0)


def test_cramers_v_independent_is_zero_and_single_level_null(spark):
    indep = [
        ("i", a, b) for a in ["x", "y"] for b in ["p", "q"] for _ in range(5)
    ]
    single = [("s", "x", b) for b in ["p", "q"]]
    df = spark.createDataFrame(indep + single, "g string, a string, b string")
    out = {r["g"]: r for r in stats.cramers_v(df, "a", "b", "g").collect()}
    assert out["i"]["chi2"] == pytest.approx(0.0)
    assert out["i"]["v"] == pytest.approx(0.0)
    assert out["s"]["v"] is None  # min(r-1, c-1) = 0


# --- anova_oneway -------------------------------------------------------------


def _anova_ref(groups):
    import statistics

    all_vals = [v for g in groups for v in g]
    n, k = len(all_vals), len(groups)
    gm = sum(all_vals) / n
    ssb = sum(len(g) * (statistics.fmean(g) - gm) ** 2 for g in groups)
    ssw = sum(sum((v - statistics.fmean(g)) ** 2 for v in g) for g in groups)
    return (ssb / (k - 1)) / (ssw / (n - k)), ssb / (ssb + ssw)


def test_anova_oneway_matches_closed_form(spark):
    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0], "c": [5.0, 6.0, 10.0]}
    rows = [("f", g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "fam string, g string, v double")
    row = stats.anova_oneway(df, "v", "g", "fam").collect()[0]
    f_ref, eta_ref = _anova_ref(list(groups.values()))
    assert row["k"] == 3 and row["n"] == 9
    assert row["f_stat"] == pytest.approx(f_ref, abs=1e-6)
    assert row["eta_sq"] == pytest.approx(eta_ref, abs=1e-6)


def test_anova_oneway_degenerate_families(spark):
    df = spark.createDataFrame(
        [
            # one level only -> k-1 = 0 -> NULL F
            ("onelvl", "a", 1.0), ("onelvl", "a", 2.0),
            # zero within variance -> SSW 0 -> NULL F, eta 1
            ("zerow", "a", 1.0), ("zerow", "a", 1.0),
            ("zerow", "b", 2.0), ("zerow", "b", 2.0),
            ("null", "a", None), ("null", None, 1.0), ("null", "a", 3.0),
            ("null", "b", 4.0),
        ],
        "fam string, g string, v double",
    )
    out = {r["fam"]: r for r in stats.anova_oneway(df, "v", "g", "fam").collect()}
    assert out["onelvl"]["f_stat"] is None
    assert out["zerow"]["f_stat"] is None
    assert out["zerow"]["eta_sq"] == pytest.approx(1.0)
    assert out["null"]["n"] == 2  # NULL value / NULL level rows excluded


def test_chi_square_structural_zero_cell_counts_expected(spark):
    # 2x2 with an unobserved (y,q) cell: the zero cell still contributes
    # its expected count to chi2 (o^2/e - n identity). Hand value: 3.75.
    rows = (
        [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5
    )
    df = spark.createDataFrame(rows, "a string, b string")
    row = stats.chi_square_independence(df, "a", "b").collect()[0]
    assert row["n"] == 15 and row["dof"] == 1
    assert row["chi2"] == pytest.approx(3.75, abs=1e-6)
