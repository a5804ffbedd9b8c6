"""Adversarial dirty-data property tests for the mixing layer (round-4):
prepare_training_data fuzzed with hostile unicode — NULs, zero-width
chars, combining marks, RTL scripts, 1-token docs, docs exactly at the
packing budget — asserting determinism and stage invariants. The
well-formed-fixture behavior is pinned in test_mixing/test_corpus; these
exist because real web corpora are NOT well formed.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import corpus

# token vocabulary mixing plain words with hostile content: NUL bytes,
# zero-width space, combining marks (e + U+0301), RTL Hebrew/Arabic,
# whitespace-adjacent controls
_HOSTILE_TOKENS = [
    "the", "and", "data", "of", "to", "in",
    "x\x00y",          # embedded NUL inside a token
    "\x00",            # bare NUL token
    "a​b",        # zero-width space inside a token
    "éclair",    # combining acute
    "שלום",    # Hebrew (RTL)
    "مرحبا",  # Arabic (RTL)
    "café",
    "1",
]

_doc_strategy = st.lists(
    st.sampled_from(_HOSTILE_TOKENS), min_size=1, max_size=24
).map(lambda ws: " ".join(ws))


def _tokens(text: str) -> list[str]:
    # mirror of text.tokens(): trim, split on \s+ (NUL is NOT whitespace)
    t = text.strip()
    return t.split() if t else []


def _grams(text: str, n: int) -> set[tuple]:
    toks = _tokens(text)
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _run(spark, rows, bench_rows, repartition=None, budget=8):
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    if repartition:
        docs = docs.repartition(repartition)
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    out = corpus.prepare_training_data(
        docs,
        bench,
        "text",
        "doc_id",
        "src",
        rates={"s": 1.0},
        min_quality=0.0,
        jaccard_threshold=0.99,  # near-dup sweep effectively off: isolate
        max_doc_freq=None,       # the unicode handling, not dedup recall
        contamination_n=3,
        budget=budget,
        block_size=16,
    )
    return sorted(map(tuple, out.collect()))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc_strategy, min_size=1, max_size=10))
@pytest.mark.slow
def test_prepare_training_data_hostile_unicode_invariants(spark, docs):
    rows = [(i, t, "s") for i, t in enumerate(docs)]
    bench_rows = [(1000, "the and data of to in the and data")]
    out = _run(spark, rows, bench_rows)

    # 1. determinism: identical output under a different partitioning
    assert out == _run(spark, rows, bench_rows, repartition=7)

    by_id = {}
    for r in out:
        # 2. survivors come from the input, each at most once
        assert r[0] in {i for i, _, _ in rows}
        assert r[0] not in by_id
        by_id[r[0]] = r
        # 3. split values are exactly the standard bands
        assert r[2] in {"train", "val", "test"}
        assert r[5] >= 0  # n_tokens

    # 4. decontamination: no survivor shares a 3-gram with the benchmark
    bench_grams = _grams(bench_rows[0][1], 3)
    for doc_id, text, _ in rows:
        if doc_id in by_id:
            assert not (_grams(text, 3) & bench_grams), text

    # 5. packing consistency: within each (src, split, block), cum_tokens
    # is the running sum in doc_id order and seq_in_block is its
    # pre-doc cumulative div budget
    groups: dict[tuple, list] = {}
    for r in out:
        groups.setdefault((r[1], r[2], r[3]), []).append(r)
    for g in groups.values():
        g.sort(key=lambda r: r[0])
        running = 0
        for r in g:
            assert r[4] == running // 8, r  # seq_in_block, budget=8
            running += r[5]
            assert r[6] == running, r  # cum_tokens


@pytest.mark.slow
def test_nul_and_zero_width_docs_survive_deterministically(spark):
    """NUL bytes and zero-width chars are DATA, not delimiters: they pass
    the pipeline unmangled, count as token characters, and never crash a
    stage."""
    rows = [
        (0, "x\x00y data pipeline quality the and of", "s"),
        (1, "a​b data pipeline quality the and of", "s"),
        (2, "\x00 \x00 \x00", "s"),
        (3, "normal words only here today friends again", "s"),
    ]
    bench_rows = [(99, "completely unrelated benchmark text")]
    out = _run(spark, rows, bench_rows)
    ids = {r[0] for r in out}
    # docs 0,1,3 are distinct texts that share no benchmark grams; doc 2
    # may be gated on quality but must not crash anything
    assert {0, 1, 3} <= ids
    assert out == _run(spark, rows, bench_rows, repartition=5)


def test_one_token_docs_are_gated_not_crashed(spark):
    """A 1-token doc has top_token_frac == 1.0 and is dropped by the
    Gopher repetition gate BY DESIGN (nothing to train on) — the pipeline
    must gate it cleanly, never crash or emit it."""
    rows = [
        (0, "one", "s"),
        (1, "a perfectly normal document with many distinct words", "s"),
        (2, "\x00", "s"),  # 1-token doc that is a bare NUL
    ]
    bench_rows = [(99, "unrelated benchmark content")]
    out = _run(spark, rows, bench_rows, budget=8)
    assert {r[0] for r in out} == {1}


@pytest.mark.slow
def test_exact_budget_doc_packs_one_full_sequence(spark):
    """Docs of exactly `budget` tokens: packing stays exact — the full-
    budget doc closes its sequence, and running totals never
    double-count. (All docs here pass the repetition gate: distinct
    tokens, >4 tokens.)"""
    eight = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    # 7+ distinct tokens each: shorter docs hit the bigram gate —
    # top_bigram_frac = 1/(n-1), and 1/5 = 0.2 > 0.18 (short docs ARE
    # suspect under Gopher thresholds)
    rows = [
        (0, "red green blue yellow purple orange pink", "s"),    # 7 tokens
        (1, eight, "s"),                                         # == budget
        (2, "north south east west center middle edge", "s"),    # 7 tokens
    ]
    bench_rows = [(99, "unrelated benchmark content")]
    out = _run(spark, rows, bench_rows, budget=8)
    got = {r[0]: r for r in out}
    assert set(got) == {0, 1, 2}
    # all in block 0 (ids < 16), id order. greedy: doc0 -> seq0 (cum 7),
    # doc1 starts at 7 -> seq0 (overflow by design, cum 15), doc2 starts
    # at 15 -> seq1 (cum 22)
    assert (got[0][4], got[0][6]) == (0, 7)
    assert (got[1][4], got[1][6]) == (0, 15)
    assert (got[2][4], got[2][6]) == (1, 22)
    # a lone exact-budget doc: one exactly-full sequence
    solo = _run(spark, [(0, eight, "s")], bench_rows, budget=8)
    assert len(solo) == 1 and (solo[0][4], solo[0][5], solo[0][6]) == (0, 8, 8)
