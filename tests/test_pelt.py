"""Round-13 wave 2: PELT multiple-changepoint segmentation.

Rows-only at the driver (penalized DP is not SQL-expressible); these pin
what makes it trustworthy: EXACTNESS — PELT's pruning provably never
loses the optimum, so its segmentation must equal the unpruned O(n^2)
optimal-partition DP — plus planted-shift recovery, penalty
monotonicity, min_size, and repartition determinism.
"""

from __future__ import annotations

import math

import pytest

from opendosm_parquet_to_sqlite_spark.operators.temporal import (
    _pelt_segments,
    changepoints_pelt,
)


# --- independent reference: unpruned optimal-partition DP ----------------------


def _dp_segments(xs, penalty, min_size):
    """O(n^2) exact DP with NO pruning, written independently: same
    earliest-split tie-break, same SSE cost."""
    n = len(xs)
    s1 = [0.0] * (n + 1)
    s2 = [0.0] * (n + 1)
    for i, v in enumerate(xs):
        s1[i + 1] = s1[i] + v
        s2[i + 1] = s2[i] + v * v

    def sse(a, b):
        m = b - a
        sm = s1[b] - s1[a]
        return (s2[b] - s2[a]) - sm * sm / m

    INF = float("inf")
    f = [INF] * (n + 1)
    f[0] = -penalty
    prev = [0] * (n + 1)
    for t in range(min_size, n + 1):
        for s in range(0, t - min_size + 1):
            if f[s] == INF:
                continue
            v = f[s] + sse(s, t) + penalty
            if v < f[t] - 1e-12:
                f[t], prev[t] = v, s
    cuts, t = [], n
    while t > 0:
        cuts.append(t)
        t = prev[t]
    return sorted(cuts), f[n]


def _planted(shifts, seg_len=25, noise=0.13):
    """Deterministic series: one mean level per shift, reproducible
    pseudo-noise (no RNG)."""
    xs = []
    for lvl in shifts:
        for i in range(seg_len):
            xs.append(lvl + noise * math.sin(i * 2.39996))
    return xs


@pytest.mark.parametrize(
    "shifts,penalty",
    [
        ([0.0, 3.0], 1.0),
        ([0.0, 2.0, -1.5, 4.0], 0.8),
        ([1.0], 1.0),                 # no change
        ([0.0, 0.2], 50.0),           # penalty swallows a small shift
    ],
)
def test_pelt_equals_unpruned_dp(shifts, penalty):
    xs = _planted(shifts)
    got = _pelt_segments(xs, penalty, 2)
    ref_cuts, ref_cost = _dp_segments(xs, penalty, 2)
    assert got == ref_cuts
    # planted well-separated shifts are recovered exactly at multiples
    # of seg_len (when the penalty lets them through)
    if penalty < 10 and len(shifts) > 1:
        assert got == [25 * (i + 1) for i in range(len(shifts))]


def test_pelt_penalty_monotone():
    xs = _planted([0.0, 1.0, 2.0, 3.0], seg_len=20)
    n_cuts = [
        len(_pelt_segments(xs, b, 2)) for b in (0.3, 1.0, 5.0, 1e6)
    ]
    assert n_cuts == sorted(n_cuts, reverse=True)
    assert n_cuts[-1] == 1  # huge penalty → one segment


def test_pelt_min_size_respected():
    xs = _planted([0.0, 5.0, 0.0], seg_len=6)
    cuts = _pelt_segments(xs, 0.5, 4)
    last = 0
    for c in cuts:
        assert c - last >= 4
        last = c


# --- the operator --------------------------------------------------------------


def _series_df(spark, series_by_key):
    rows = []
    for key, xs in series_by_key.items():
        for i, v in enumerate(xs):
            rows.append((key, i, i, float(v)))
    return spark.createDataFrame(
        rows, "k string, t long, tb long, v double"
    )


def test_pelt_operator_planted_shifts(spark):
    df = _series_df(
        spark,
        {
            "a": _planted([0.0, 3.0, -2.0]),
            "b": _planted([1.0]),  # no change
        },
    )
    out = changepoints_pelt(
        df, ["k"], "t", "v", "tb", penalty=1.0
    ).collect()
    a = sorted((r.seg, r.start_order, r.end_order, r.n)
               for r in out if r.k == "a")
    assert a == [(1, 0, 24, 25), (2, 25, 49, 25), (3, 50, 74, 25)]
    b = [r for r in out if r.k == "b"]
    assert len(b) == 1 and b[0].n == 25
    # segment means recover the planted levels
    means = {r.seg: r.mean for r in out if r.k == "a"}
    assert means[1] == pytest.approx(0.0, abs=0.05)
    assert means[2] == pytest.approx(3.0, abs=0.05)
    assert means[3] == pytest.approx(-2.0, abs=0.05)


def test_pelt_operator_bic_default_and_determinism(spark):
    df = _series_df(spark, {"a": _planted([0.0, 4.0]), "b": [1.0, 1.1]})
    base = sorted(
        map(tuple, changepoints_pelt(df, ["k"], "t", "v", "tb").collect())
    )
    repart = sorted(
        map(
            tuple,
            changepoints_pelt(
                df.repartition(7), ["k"], "t", "v", "tb"
            ).collect(),
        )
    )
    assert base == repart
    # the 2-point key returns one whole-key segment (n < 2*min_size);
    # row tuple order: (k, seg, start_order, end_order, n, mean)
    b_rows = [r for r in base if r[0] == "b"]
    assert len(b_rows) == 1 and b_rows[0][4] == 2


def test_pelt_operator_null_hygiene_and_validation(spark):
    df = _series_df(spark, {"a": _planted([0.0, 4.0])}).union(
        spark.createDataFrame(
            [("a", None, 0, 1.0), ("a", 200, 0, None)],
            "k string, t long, tb long, v double",
        )
    )
    out = changepoints_pelt(df, ["k"], "t", "v", "tb", penalty=1.0)
    assert sum(r.n for r in out.collect()) == 50  # NULLs dropped
    with pytest.raises(ValueError, match="min_size"):
        changepoints_pelt(df, ["k"], "t", "v", "tb", min_size=0)
    with pytest.raises(ValueError, match="penalty"):
        changepoints_pelt(df, ["k"], "t", "v", "tb", penalty=-1.0)
