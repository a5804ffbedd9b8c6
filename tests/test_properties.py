"""Hypothesis property tests (SURVEY §5.2): flagship dedup invariants over
random inputs, cross-checked between the two physical variants and a
pure-Python oracle. max_examples kept small — each example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opendosm_parquet_to_sqlite_spark.operators import dedup, neardup, temporal

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id (few keys → dups)
        st.sampled_from(["a", "b"]),                # event_type
        st.integers(min_value=0, max_value=50),     # ts
        st.integers(min_value=0, max_value=10**6),  # event_id (tiebreak)
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=1,
    max_size=40,
)

COLS = ["user_id", "event_type", "ts", "event_id", "value"]


def _py_oracle(rows):
    best = {}
    for r in rows:
        k = (r[0], r[1])
        # champion: max by (ts, event_id) — the pinned deterministic rule
        if k not in best or (r[2], r[3]) > (best[k][2], best[k][3]):
            best[k] = r
    return set(best.values())


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_latest_per_group_matches_python_oracle(spark, rows):
    # hypothesis may generate duplicate (key, ts, event_id) rows with
    # different values — drop to keep the champion well-defined
    seen, uniq = set(), []
    for r in rows:
        k = (r[0], r[1], r[2], r[3])
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    df = spark.createDataFrame(uniq, COLS)
    expected = _py_oracle(uniq)
    window = {tuple(r) for r in dedup.latest_per_group(
        df, ["user_id", "event_type"], "ts", ["event_id"]).collect()}
    maxby = {tuple(r) for r in dedup.latest_per_group_maxby(
        df, ["user_id", "event_type"], "ts", ["event_id"]).collect()}
    assert window == expected
    assert maxby == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 999)),
        min_size=0, max_size=25, unique_by=lambda t: (t[0], t[1]),
    ),
    probes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=15,
    ),
)
def test_asof_join_matches_python_oracle(spark, events, probes):
    """asof_join == brute-force 'latest event with ts <= probe ts per key'
    for arbitrary inputs, including unseen keys and empty event sets.
    Events are unique per (key, ts) — the operator's documented contract."""
    ev = spark.createDataFrame(events, "key int, ts int, payload int") \
        if events else spark.createDataFrame([], "key int, ts int, payload int")
    pr = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(probes)],
        "probe_id int, key int, pts int",
    )
    got = {
        r["probe_id"]: r["asof_payload"]
        for r in temporal.asof_join(
            pr, ev, on=["key"], probe_ts="pts", event_ts="ts",
            payload_cols=["payload"],
        ).collect()
    }
    expected = {}
    for i, (k, t) in enumerate(probes):
        best = [e for e in events if e[0] == k and e[1] <= t]
        expected[i] = max(best, key=lambda e: e[1])[2] if best else None
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=8).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    )
)
def test_ngram_jaccard_matches_python_oracle(spark, docs):
    """Exact unigram Jaccard pairs == set-algebra oracle, at any threshold."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in neardup.ngram_jaccard_pairs(
            df, "text", "doc_id", n=1, threshold=0.2
        ).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    expected = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                if inter:
                    jac = round(inter / len(sets[i] | sets[j]), 6)
                    if jac >= 0.2:
                        expected[(i, j)] = jac
    assert got == expected
