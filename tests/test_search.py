"""BM25 / tf-idf retrieval: ranking semantics against hand-computed scores,
plus the plan-shape contract (query-term pruning before any exchange)."""

from __future__ import annotations

import math

import pytest

from opendosm_parquet_to_sqlite_spark.operators import search

DOCS = [
    # doc 0: "rare" appears only here -> must dominate a query for it
    (0, "rare term alpha beta gamma"),
    (1, "common common common alpha"),
    (2, "common alpha beta"),
    (3, "common beta beta gamma gamma gamma"),
    (4, ""),  # empty doc: zero tokens, must never score or crash
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, schema="query_id long, query_text string")


def _bm25_reference(corpus: list[tuple[int, str]], qterms: list[str]) -> dict[int, float]:
    """Plain-Python Okapi BM25 oracle (same formula, same constants)."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores: dict[int, float] = {}
    for term in set(qterms):
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            contrib = idf * tf * 2.2 / (
                tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl)
            )
            scores[d] = scores.get(d, 0.0) + contrib
    return scores


def test_bm25_matches_reference_scores(spark, docs):
    got = {
        r.doc_id: r.score
        for r in search.bm25_topk(
            docs, _queries(spark, [(0, "rare gamma")]), "text", "doc_id", k=10
        ).collect()
    }
    want = _bm25_reference(DOCS, ["rare", "gamma"])
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(round(s, 6), abs=1e-6)


def test_bm25_rare_term_outranks_common(spark, docs):
    rows = search.bm25_topk(
        docs, _queries(spark, [(0, "rare common")]), "text", "doc_id", k=10
    ).collect()
    top = min(rows, key=lambda r: r.rank)
    assert top.doc_id == 0  # idf of the unique term dominates


def test_bm25_k_bound_and_rank_contiguity(spark, docs):
    rows = search.bm25_topk(
        docs, _queries(spark, [(0, "alpha beta"), (1, "common")]),
        "text", "doc_id", k=2,
    ).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2


def test_bm25_unseen_terms_yield_no_rows(spark, docs):
    assert (
        search.bm25_topk(
            docs, _queries(spark, [(0, "zzz qqq")]), "text", "doc_id"
        ).count()
        == 0
    )


def test_bm25_duplicate_query_terms_count_once(spark, docs):
    once = search.bm25_topk(
        docs, _queries(spark, [(0, "gamma")]), "text", "doc_id"
    ).collect()
    thrice = search.bm25_topk(
        docs, _queries(spark, [(0, "gamma gamma gamma")]), "text", "doc_id"
    ).collect()
    assert sorted((r.doc_id, r.score) for r in once) == sorted(
        (r.doc_id, r.score) for r in thrice
    )


def test_bm25_case_insensitive(spark, docs):
    lo = search.bm25_topk(
        docs, _queries(spark, [(0, "ALPHA Beta")]), "text", "doc_id"
    ).collect()
    hi = search.bm25_topk(
        docs, _queries(spark, [(0, "alpha beta")]), "text", "doc_id"
    ).collect()
    assert sorted((r.doc_id, r.score) for r in lo) == sorted(
        (r.doc_id, r.score) for r in hi
    )


def test_tfidf_top_terms_shape_and_tiebreak(spark, docs):
    rows = search.tfidf_top_terms_per_doc(docs, "text", "doc_id", k=2).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc  # empty doc has no terms
    for d, rs in by_doc.items():
        assert len(rs) <= 2
        rs = sorted(rs, key=lambda r: r.rank)
        # ranks descend by (rounded) score; ties broken by term asc
        for a, b in zip(rs, rs[1:]):
            assert (round(a.tfidf, 9), b.term) >= (round(b.tfidf, 9), a.term) or (
                a.tfidf > b.tfidf
            )


def test_tfidf_unique_term_is_most_characteristic(spark, docs):
    rows = search.tfidf_top_terms_per_doc(docs, "text", "doc_id", k=1).collect()
    top0 = next(r for r in rows if r.doc_id == 0)
    assert top0.term == "rare"


def test_bm25_plan_prunes_before_aggregation(spark, docs):
    """The broadcast semi-join against the query-term set must sit BELOW the
    tf aggregation in the plan — scoring shuffles matched postings only."""
    plan = search.bm25_topk(
        docs, _queries(spark, [(0, "alpha")]), "text", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    semi_at = plan.find("LeftSemi")
    agg_at = plan.find("HashAggregate")
    assert semi_at != -1 and agg_at != -1
    # executedPlan prints top-down: the semi join must appear AFTER the
    # (doc,term) aggregate textually, i.e. deeper in the tree
    assert semi_at > agg_at


def test_rrf_fuse_semantics(spark):
    from opendosm_parquet_to_sqlite_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    vec = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    out = {
        r.doc_id: (r.rrf_score, r.rank)
        for r in rrf_fuse(
            lex, vec, doc_b="neighbor_id", k_rrf=60, k=10
        ).collect()
    }
    # doc 11 in both lists wins; one-list docs get only their own term
    assert out[11][0] == round(1 / 62 + 1 / 61, 6)
    assert out[11][1] == 1
    assert out[10][0] == round(1 / 61, 6)
    assert out[13][0] == round(1 / 62, 6)
    assert out[12][0] == round(1 / 63, 6)
    # 10 (1/61) beats 13 (1/62) beats 12 (1/63)
    assert [d for d, (_, rk) in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        11, 10, 13, 12
    ]


def test_rrf_fuse_tiebreak_by_doc_id(spark):
    from opendosm_parquet_to_sqlite_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 7, 1), (0, 5, 2)], "query_id long, doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(0, 5, 1), (0, 7, 2)], "query_id long, doc_id long, rank long"
    )
    out = rrf_fuse(lex, vec, k=10).orderBy("rank").collect()
    # identical fused scores -> smaller doc_id ranks first
    assert [r.doc_id for r in out] == [5, 7]
    assert out[0].rrf_score == out[1].rrf_score
