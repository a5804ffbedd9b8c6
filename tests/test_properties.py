"""Hypothesis property tests (SURVEY §5.2): flagship dedup invariants over
random inputs, cross-checked between the two physical variants and a
pure-Python oracle. max_examples kept small — each example is a Spark job.
"""

from __future__ import annotations

import pytest

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
@pytest.mark.slow
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
@pytest.mark.slow
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
                    # round() tie-hazard audit (round-6 verdict): a Python
                    # vs Spark HALF_UP divergence needs a shortest repr
                    # terminating in '5' at the 7th decimal; with union
                    # sizes <= 7 the only terminating denominators are
                    # 1/2/4 (<= 2 dp), so no tie is reachable here.
                    jac = round(inter / len(sets[i] | sets[j]), 6)
                    if jac >= 0.2:
                        expected[(i, j)] = jac
    assert got == expected


# --- gram construction vs a pure-Python reference ----------------------------

token_lists = st.lists(
    st.text(alphabet="abcx", min_size=1, max_size=3), min_size=0, max_size=12
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=token_lists, n=st.integers(min_value=1, max_value=5))
def test_gram_join_matches_python_ngrams(spark, toks, n):
    from pyspark.sql import functions as F

    from opendosm_parquet_to_sqlite_spark.operators.text import ngram_list

    df = spark.createDataFrame([(toks,)], "t array<string>")
    [row] = df.select(ngram_list(F.col("t"), n).alias("g")).collect()
    expected = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ] if len(toks) >= n else []
    assert row.g == expected


# --- sequence packing vs a pure-Python greedy reference ----------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=50),
    block=st.integers(min_value=4, max_value=64),
)
def test_pack_sequences_matches_python_reference(spark, counts, budget, block):
    from pyspark.sql import functions as F

    from opendosm_parquet_to_sqlite_spark.operators.sampling import pack_sequences

    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r.doc_id: (r.block, r.seq_in_block, r.cum_tokens)
        for r in pack_sequences(
            df, "doc_id", F.col("n"), budget=budget, block_size=block
        ).collect()
    }
    # python reference: per block, running sum in id order; seq = floor of
    # the pre-doc cumulative over budget
    by_block: dict[int, int] = {}
    for i, c in rows:
        b = i // block
        before = by_block.get(b, 0)
        by_block[b] = before + c
        assert got[i] == (b, before // budget, before + c), (i, c, budget, block)


# --- connected components vs a pure-Python union-find ------------------------


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, edges):
    from opendosm_parquet_to_sqlite_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(df, "id_a", "id_b").collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    # normalize: cluster id must be the MIN member, which find() gives since
    # we always parent larger roots under smaller ones
    assert got == expected
