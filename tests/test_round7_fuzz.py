"""Hypothesis fuzz for the round-7 statistical family — random inputs vs
pure-Python closed forms. Comparison discipline (the round-6 EWMA lesson,
VERDICT r6 §wrong-1): engine outputs are rounded to 6 dp with Spark/Java
HALF_UP-on-shortest-repr semantics while Python references compute
unrounded doubles, so equality is asserted with abs_tol 2e-6 (two ulps of
the rounding grid) — NEVER exact equality of independently-rounded
floats."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import contrastive, stats

_TOL = 2e-6
_vals = st.floats(
    min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
)
_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


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
    if varx <= 0:
        return None, None, None
    slope = cov / varx
    intercept = (sy - slope * sx) / n
    r2 = cov * cov / (varx * vary) if varx * vary > 0 else None
    return slope, intercept, r2


@given(
    st.lists(st.tuples(_vals, _vals), min_size=3, max_size=40),
)
@_settings
@pytest.mark.slow
def test_fuzz_group_ols_matches_closed_form(spark, pairs):
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in pairs],
        "g string, x double, y double",
    )
    row = stats.group_ols(df, "x", "y", "g").collect()[0]
    slope, intercept, r2 = _ols_ref(pairs)
    if slope is None:
        assert row["slope"] is None
        return
    # relative tolerance for the magnitudes, absolute floor for the
    # 6-dp rounding grid
    assert row["slope"] == pytest.approx(slope, rel=1e-4, abs=_TOL)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-4, abs=_TOL)
    if r2 is None:
        assert row["r2"] is None
    else:
        assert row["r2"] == pytest.approx(r2, rel=1e-4, abs=_TOL)


def _mwu_ref(a_vals, b_vals):
    allv = sorted(a_vals + b_vals)
    runs: dict = {}
    for v in allv:
        runs[v] = runs.get(v, 0) + 1
    midrank, start = {}, 1
    for v in sorted(runs):
        t = runs[v]
        midrank[v] = start + (t - 1) / 2.0
        start += t
    ra = sum(midrank[v] for v in a_vals)
    na, nb = len(a_vals), len(b_vals)
    n = na + nb
    u = ra - na * (na + 1) / 2.0
    tie_term = sum(t**3 - t for t in runs.values())
    sigma2 = (na * nb / 12.0) * (
        (n + 1) - tie_term / (n * (n - 1))
    ) if n > 1 else 0.0
    z = (u - na * nb / 2.0) / math.sqrt(sigma2) if sigma2 > 0 else None
    return u, z


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.booleans()),
        min_size=2,
        max_size=60,
    ).filter(
        lambda rows: any(s for _, s in rows) and any(not s for _, s in rows)
    ),
)
@_settings
@pytest.mark.slow
def test_fuzz_mann_whitney_with_heavy_ties(spark, rows):
    """Integer values 0-9 force heavy tie runs — the midrank and the
    tie-corrected sigma are exactly what the fuzz exercises."""
    df = spark.createDataFrame(
        [("g", float(v), int(s)) for v, s in rows],
        "g string, v double, side int",
    )
    out = stats.mann_whitney_u(df, "v", "side", 1, "g").collect()[0]
    a = [float(v) for v, s in rows if s]
    b = [float(v) for v, s in rows if not s]
    u, z = _mwu_ref(a, b)
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert out["u"] == pytest.approx(u, abs=_TOL)
    if z is None:
        assert out["z"] is None
    else:
        assert out["z"] == pytest.approx(z, rel=1e-4, abs=_TOL)


@given(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=40),
    st.lists(st.sampled_from("cdefg"), min_size=1, max_size=40),
)
@_settings
@pytest.mark.slow
def test_fuzz_js_divergence_bounds_and_parity(spark, a_vals, b_vals):
    import collections

    from opendosm_parquet_to_sqlite_spark.operators.features import (
        js_divergence,
    )

    a = spark.createDataFrame(
        [("g", v) for v in a_vals], "g string, c string"
    )
    b = spark.createDataFrame(
        [("g", v) for v in b_vals], "g string, c string"
    )
    out = js_divergence(a, b, "c", "g").collect()[0]
    pa, pb = collections.Counter(a_vals), collections.Counter(b_vals)
    na, nb = len(a_vals), len(b_vals)
    js = 0.0
    for c in set(pa) | set(pb):
        p, q = pa.get(c, 0) / na, pb.get(c, 0) / nb
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    assert out["js"] == pytest.approx(js, abs=_TOL)
    assert -_TOL <= out["js"] <= math.log(2) + _TOL  # bounded metric


@given(st.permutations(list(range(12))), st.integers(1, 8))
@_settings
@pytest.mark.slow
def test_fuzz_preference_pairs_invariant_to_row_order(spark, perm, parts):
    """The (chosen, rejected) champions must not depend on row order or
    partitioning — max_by/min_by with struct tie-breaks guarantee it."""
    rows = [("g", i, float((i * 5) % 7)) for i in perm]
    df = spark.createDataFrame(
        rows, "g string, id long, score double"
    ).repartition(parts)
    got = contrastive.preference_pairs(df, "g", "id", "score").collect()
    assert len(got) == 1
    r = got[0]
    # scores (i*5)%7: max 6 first reached by smallest id with score 6,
    # min 0 by smallest id with score 0 — independent of perm
    ids_by_score: dict = {}
    for i in range(12):
        ids_by_score.setdefault((i * 5) % 7, []).append(i)
    assert r["chosen_id"] == min(ids_by_score[max(ids_by_score)])
    assert r["rejected_id"] == min(ids_by_score[min(ids_by_score)])
