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
