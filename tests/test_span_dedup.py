"""span_stats: cross-doc repeated-span semantics, hashed/raw equivalence."""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.operators.neardup import span_stats

BOILER = "one two three four five six seven eight"  # exactly one 8-gram

DOCS = [
    (0, BOILER + " tail0 alpha beta"),          # shares the 8-gram with 1,2
    (1, "head1 " + BOILER),                      # shares it
    (2, BOILER),                                 # exactly the span, nothing else
    (3, "totally different words with no overlap at all here"),
    (4, "short doc"),                            # < 8 tokens: zero spans
    (5, ""),                                     # empty
    (6, BOILER + " " + BOILER),                  # within-doc repeat + cross-doc
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(DOCS, schema="doc_id long, text string")
    return {r.doc_id: r for r in span_stats(df, "text", "doc_id", n=8).collect()}


def test_span_counts(stats):
    assert stats[0].n_spans == 4   # 11 tokens -> 4 spans
    assert stats[2].n_spans == 1
    assert stats[4].n_spans == 0
    assert stats[5].n_spans == 0


def test_cross_doc_duplicates_detected(stats):
    # the shared boilerplate 8-gram occurs in docs 0,1,2,6 -> duplicated
    assert stats[0].n_dup_spans == 1
    assert stats[1].n_dup_spans == 1
    assert stats[2].n_dup_spans == 1
    assert stats[2].dup_span_ratio == 1.0
    assert stats[3].n_dup_spans == 0


def test_multiplicity_counted(stats):
    # doc 6 = BOILER twice (16 tokens, 9 spans): the boilerplate gram
    # appears at positions 0 and 8 -> both counted; the 7 bridging spans
    # (unique to doc 6) are not
    assert stats[6].n_spans == 9
    assert stats[6].n_dup_spans == 2
    assert stats[6].dup_span_ratio == pytest.approx(round(2 / 9, 6))


def test_short_and_empty_docs_report_zero_ratio(stats):
    for d in (4, 5):
        assert stats[d].n_dup_spans == 0
        assert stats[d].dup_span_ratio == 0.0


def test_within_doc_only_repetition_not_flagged(spark):
    # a doc repeating ITS OWN unique span (absent elsewhere) is clean here
    df = spark.createDataFrame(
        [
            (0, "u1 u2 u3 u4 u5 u6 u7 u8 " + "u1 u2 u3 u4 u5 u6 u7 u8"),
            (1, "something else entirely distinct from the first document"),
        ],
        schema="doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_stats(df, "text", "doc_id", n=8).collect()}
    assert out[0].n_dup_spans == 0


def test_hashed_matches_raw(spark):
    df = spark.createDataFrame(DOCS, schema="doc_id long, text string")
    raw = sorted(map(tuple, span_stats(df, "text", "doc_id", hashed=False).collect()))
    hashed = sorted(map(tuple, span_stats(df, "text", "doc_id", hashed=True).collect()))
    assert raw == hashed


# --- remove_repeated_spans: the Lee et al. substring-dedup TRANSFORM ---------


SPAN = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima"
)  # 12 tokens — well past min_len=8 and the winnow guarantee


def test_planted_span_excised_from_all_but_one(spark):
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
    )

    rows = [
        (1, f"unique one text {SPAN} tail one"),
        (2, f"head two {SPAN} unique two ending"),
        (3, f"third doc {SPAN} closing words three"),
        (4, "completely unrelated text with no duplication here at all"),
        (5, ""),  # empty doc must re-emit verbatim
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_repeated_spans(df, "text", "doc_id").collect()
    }
    # every input doc re-emits
    assert set(out) == {1, 2, 3, 4, 5}
    # the smallest-id member keeps its copy VERBATIM
    assert out[1].text == rows[0][1] and out[1].n_removed == 0
    # higher-id members lose exactly the 12-token span, nothing else
    assert out[2].text == "head two unique two ending"
    assert out[2].n_removed == 12
    assert out[3].text == "third doc closing words three"
    assert out[3].n_removed == 12
    # the span survives in exactly one document corpus-wide
    n_carriers = sum(SPAN in r.text for r in out.values())
    assert n_carriers == 1
    # untouched docs: verbatim text, zero removed (mass conservation)
    assert out[4].text == rows[3][1] and out[4].n_removed == 0
    assert out[5].text == "" and out[5].n_removed == 0


def test_mass_conservation_token_accounting(spark):
    """Σ tokens(out) + Σ n_removed == Σ tokens(in): the cut removes
    exactly what it reports and nothing else."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
    )

    rows = [
        (10, f"aa bb {SPAN} cc dd"),
        (11, f"{SPAN} xx yy zz"),
        (12, "independent filler words that stay fully intact always"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_repeated_spans(df, "text", "doc_id").collect()
    tokens_in = sum(len(t.split()) for _, t in rows)
    tokens_out = sum(len(r.text.split()) for r in out)
    removed = sum(r.n_removed for r in out)
    assert tokens_out + removed == tokens_in
    assert removed == 12  # one span, one excision


def test_overlapping_cuts_union_not_double_count(spark):
    """A doc cut by two pairs with overlapping spans loses the UNION of
    the intervals — n_removed never exceeds the doc's token count."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
    )

    # doc 3 shares its whole text with 1 AND with 2 (two pairs, both cut
    # doc 3 on overlapping intervals)
    rows = [
        (1, SPAN),
        (2, SPAN),
        (3, SPAN),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_repeated_spans(df, "text", "doc_id").collect()
    }
    assert out[1].n_removed == 0 and out[1].text == SPAN
    assert out[2].n_removed == 12 and out[2].text == ""
    assert out[3].n_removed == 12 and out[3].text == ""


@pytest.mark.slow
def test_prepare_training_data_span_stage_optin(spark):
    """Flag-off output is byte-stable vs flag-on: the span stage shrinks
    cut docs' token budgets (packing sees cleaned text) and defaults to
    OFF so the registered oracle contract is untouched."""
    from opendosm_parquet_to_sqlite_spark.operators.corpus import (
        prepare_training_data,
    )

    filler_a = "the quick brown fox jumps over lazy dogs daily " * 2
    filler_b = "every single sentence here differs from neighbours " * 2
    rows = [
        (1, f"{filler_a}{SPAN}", "s1"),
        (2, f"{filler_b}{SPAN}", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, strat string")
    bench = spark.createDataFrame(
        [(100, "benchmark only words none shared")], "doc_id long, text string"
    )
    kw = dict(
        rates={"s1": 1.0}, min_quality=0.0, jaccard_threshold=0.95,
        budget=1000,
    )
    off = {r.doc_id: r for r in prepare_training_data(
        df, bench, "text", "doc_id", "strat", **kw).collect()}
    on = {r.doc_id: r for r in prepare_training_data(
        df, bench, "text", "doc_id", "strat", remove_spans=True, **kw
    ).collect()}
    assert set(off) == set(on) == {1, 2}
    # doc 1 (lower id) keeps the span either way; doc 2 loses 12 tokens
    assert on[1].n_tokens == off[1].n_tokens
    assert on[2].n_tokens == off[2].n_tokens - 12


@pytest.mark.slow
def test_iterated_removal_converges_on_multi_span_pairs(spark):
    """Two disjoint 12-token spans shared by the same pair: pass 1 cuts
    the longest, pass 2 the second; the wrapper accumulates n_removed
    across passes and stops when a pass removes nothing."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
        remove_repeated_spans_iterated,
    )

    span2 = (
        "mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray"
    )
    rows = [
        (1, f"{SPAN} one unique middle words here {span2}"),
        (2, f"{SPAN} two distinct middle tokens go {span2} trailing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    single = {r.doc_id: r for r in
              remove_repeated_spans(df, "text", "doc_id").collect()}
    # single pass cuts only ONE span from doc 2 (per-pair longest)
    assert single[2].n_removed == 12
    out = {r.doc_id: r for r in remove_repeated_spans_iterated(
        df, "text", "doc_id", max_passes=4).collect()}
    assert out[1].n_removed == 0 and out[1].text == rows[0][1]
    # both spans excised from doc 2; its own words survive
    assert out[2].n_removed == 24
    assert SPAN not in out[2].text and span2 not in out[2].text
    for w in ("two", "distinct", "middle", "tokens", "go", "trailing"):
        assert w in out[2].text


@pytest.mark.slow
def test_within_doc_internal_repeat_excised_once(spark):
    """Round-10 verdict item 3: a doc repeating its own boilerplate
    internally loses every occurrence after the first; prose stays
    untouched; other docs are verbatim."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
        repeated_spans_within,
    )

    p = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (1, f"intro one two three {p} middle bit here {p} outro"),
        (2, "totally normal prose with no internal repetition anywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_spans_within(df, "text", "doc_id").collect()
    assert [(r.doc_id, r.start_a, r.start_b, r.span_len) for r in spans] == [
        (1, 4, 15, 8)
    ]
    # default (within_doc=False): internal repeat survives — plan shape
    # of the hash-pinned single-pass form is unchanged
    off = {r.doc_id: r for r in
           remove_repeated_spans(df, "text", "doc_id").collect()}
    assert off[1].n_removed == 0 and off[1].text == rows[0][1]
    on = {r.doc_id: r for r in remove_repeated_spans(
        df, "text", "doc_id", within_doc=True).collect()}
    assert on[1].n_removed == 8
    assert on[1].text == (
        f"intro one two three {p} middle bit here outro"
    )
    assert on[2].n_removed == 0 and on[2].text == rows[1][1]


def test_within_doc_tandem_repeat_keeps_first_period(spark):
    """Tandem repeats (period < span length) need no special casing: the
    run on the period diagonal cuts everything after the first period —
    including periods SHORTER than the winnow window, the case the
    gram-frequency candidate gate exists for."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
    )

    rows = [(1, ("x y " * 5).strip())]  # "x y" echoed 5 times, 10 tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_repeated_spans(
        df, "text", "doc_id", within_doc=True).collect()[0]
    assert out.text == "x y" and out.n_removed == 8


def test_within_doc_three_occurrences_single_pass(spark):
    """m occurrences inside ONE doc need only one pass (every later
    occurrence is its own run against the first): all-but-first go."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
    )

    p = "alpha bravo charlie delta echo foxtrot golf hotel"
    df = spark.createDataFrame(
        [(1, f"{p} {p} {p}")], "doc_id long, text string"
    )
    out = remove_repeated_spans(
        df, "text", "doc_id", within_doc=True).collect()[0]
    assert out.text == p and out.n_removed == 16


def test_within_and_cross_doc_compose_one_global_survivor(spark):
    """Composition: cross-doc keep-lowest-id + within-doc keep-first
    leaves exactly ONE occurrence across the whole corpus — doc 1's
    first copy survives; doc 2 loses its cross-doc copy AND its
    internal echoes."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        remove_repeated_spans,
    )

    p = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"{p} then fresh prose follows {p}"),
        (2, f"{p} {p} {p}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_repeated_spans(
        df, "text", "doc_id", within_doc=True).collect()}
    total = " ".join(r.text for r in out.values())
    assert total.count(p) == 1
    assert out[1].text == f"{p} then fresh prose follows"
    assert out[2].text == "" and out[2].n_removed == 24


@pytest.mark.slow
def test_prepare_training_data_within_doc_span_optin(spark):
    """span_within_doc=True threads through stage 4b: a survivor doc
    whose own text echoes a span internally loses the echo before
    packing; default keeps the composition unchanged."""
    from opendosm_parquet_to_sqlite_spark.operators.corpus import (
        prepare_training_data,
    )

    filler = "every single sentence here differs from neighbours " * 2
    rows = [(1, f"{filler}{SPAN} and then once more {SPAN}", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, strat string")
    bench = spark.createDataFrame(
        [(100, "benchmark only words none shared")], "doc_id long, text string"
    )
    kw = dict(
        rates={"s1": 1.0}, min_quality=0.0, jaccard_threshold=0.95,
        budget=1000,
    )
    off = prepare_training_data(
        df, bench, "text", "doc_id", "strat", remove_spans=True, **kw
    ).collect()[0]
    on = prepare_training_data(
        df, bench, "text", "doc_id", "strat", remove_spans=True,
        span_within_doc=True, **kw
    ).collect()[0]
    # cross-doc-only: no pair exists, text intact; within-doc: 12 tokens go
    assert on.n_tokens == off.n_tokens - 12
