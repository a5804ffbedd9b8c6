"""Bloom decontamination: superset-of-exact guarantee, FP sizing, packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import contamination

from .conftest import SF0001


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    cand = docs.filter(F.col("doc_id") % 97 != 0)
    return docs, bench, cand


def _by_doc(df):
    return {r.doc_id: r.n_overlap for r in df.collect()}


def test_bloom_is_superset_of_exact(spark, split):
    _, bench, cand = split
    exact = _by_doc(
        contamination.ngram_overlap(cand, bench, "text", "doc_id", n=5)
    )
    bloom = _by_doc(
        contamination.ngram_overlap_bloom(cand, bench, "text", "doc_id", n=5)
    )
    assert set(bloom) == set(exact)
    # no false negatives, ever
    assert all(bloom[d] >= exact[d] for d in exact)
    # and the FP excess at ~10 bits/gram stays small: <1% extra grams
    total_exact = sum(exact.values())
    total_bloom = sum(bloom.values())
    assert total_bloom - total_exact <= max(1, total_exact // 100)


@pytest.mark.slow
def test_generous_sizing_matches_exact(spark, split):
    """With m >> k*n_grams the FP probability is ~(kn/m)^k ~ 1e-17 —
    deterministic hashes, so this equality is stable, not flaky."""
    _, bench, cand = split
    exact = _by_doc(
        contamination.ngram_overlap(cand, bench, "text", "doc_id", n=5)
    )
    bloom = _by_doc(
        contamination.ngram_overlap_bloom(
            cand, bench, "text", "doc_id", n=5, m_bits=1 << 26, k=6
        )
    )
    assert bloom == exact


def test_bit_table_is_packed_and_bounded(spark, split):
    _, bench, _ = split
    m_bits = 1 << 16
    tbl = contamination.ngram_bloom_table(
        bench, "text", "doc_id", n=5, m_bits=m_bits, k=4
    ).collect()
    assert len(tbl) <= m_bits // 64
    assert all(0 <= r.word < m_bits // 64 for r in tbl)
    assert any(r.bits != 0 for r in tbl)


def test_clean_corpus_flags_nothing(spark):
    bench = spark.createDataFrame(
        [(0, "evaluation benchmark question answer pairs held out")],
        schema="doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "completely unrelated training document about other topics "
             "with many distinct words in it")],
        schema="doc_id long, text string",
    )
    out = contamination.ngram_overlap_bloom(
        docs, bench, "text", "doc_id", n=5
    ).collect()
    assert out[0].n_overlap == 0 and out[0].contaminated == 0
